"""Cap-scale dress rehearsal (VERDICT r4 next #2/#6).

Runs the FULL pipeline end-to-end over a LONG rendered sequence (default
1,000 frames -> ~200 keyframes at fps=10 / kf gap 5) on an out-and-back-
twice trajectory, so loop closures fire and the loop-time global passes
(segment-sum GlobalBA + decomposed OptimizeLandmarker) execute at
hundreds-of-KFs scale. Pool caps derive from the sequence length exactly
like the CLI (MapConfig.derive — the reference's param_M rule,
src/system.cc:23-29).

Telemetry: per-100-frame snapshots of steady frame time, map counts,
saturation drops, host RSS, and device HBM in use — the sustained-run
evidence BASELINE.md's scale table records. Prints the snapshot table to
stderr and ONE JSON line to stdout.

Usage: python bench_scale.py [n_frames] [--kind outback2]
"""

import json
import sys
import time


def _host_rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def _device_mb() -> float:
    import jax

    try:
        st = jax.local_devices()[0].memory_stats()
        if st and "bytes_in_use" in st:
            return st["bytes_in_use"] / 1e6
    except Exception:
        pass
    return float("nan")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 1000
    kind = "outback2"
    for a in sys.argv[1:]:
        if a.startswith("--kind="):
            kind = a.split("=", 1)[1]

    import os

    import jax

    here = os.path.dirname(os.path.abspath(__file__))
    from textslam_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(here)

    sys.path.insert(0, os.path.join(here, "tests"))
    import numpy as np
    import synth
    from textslam_tpu.config import CameraConfig, MapConfig, TextSLAMConfig
    from textslam_tpu.system import TextSLAM

    print(f"[scale] rendering {n_frames} frames ({kind})...", file=sys.stderr)
    if kind == "ring":
        world = synth.ring_world(seed=3)
    else:
        world = synth.TextWorld(seed=3, boxes_per_plane=4)
    poses = synth.camera_path(n_frames, kind)
    frames = [world.render(p) for p in poses]
    dets = [world.detections(p) for p in poses]

    cfg = TextSLAMConfig(
        no_text=False,
        camera=CameraConfig(
            fx=synth.FX, fy=synth.FY, cx=synth.CX, cy=synth.CY,
            width=synth.W, height=synth.H, fps=10.0,
        ),
    )
    import dataclasses

    cfg = dataclasses.replace(
        cfg, map=MapConfig.derive(n_frames, cfg.camera.fps, cfg.map))
    print(f"[scale] derived pools: kfs={cfg.map.max_keyframes} "
          f"pts={cfg.map.max_points} texts={cfg.map.max_texts}",
          file=sys.stderr)
    slam = TextSLAM(cfg)
    m = slam.map

    snapshots = []
    window = []
    t_start = time.perf_counter()
    for i in range(n_frames):
        t0 = time.perf_counter()
        slam.track_monocular(frames[i], float(i), detections=dets[i])
        window.append(time.perf_counter() - t0)
        if (i + 1) % 100 == 0:
            snap = {
                "frame": i + 1,
                "med_ms": round(float(np.median(window)) * 1e3, 1),
                "mean_ms": round(float(np.mean(window)) * 1e3, 1),
                "kfs": len(m.keyframes),
                "pts": int(m.n_points),
                "texts": int(m.n_texts),
                "drops": dict(m.saturation_drops),
                "loops": len(slam.loop_closer.closed_loops)
                if slam.loop_closer else 0,
                "rss_mb": round(_host_rss_mb(), 0),
                "dev_mb": round(_device_mb(), 0),
            }
            snapshots.append(snap)
            print(f"[scale] {snap}", file=sys.stderr)
            window = []
    wall = time.perf_counter() - t_start

    traj = slam.tracker.trajectory
    ts = [t for t, _ in traj]
    est = np.stack([p for _, p in traj])
    ate = synth.ate_rmse(ts, est, poses)

    # steady medians of the last vs the second 100-frame window: flatness
    # evidence (first window is compile/warmup)
    meds = [s["med_ms"] for s in snapshots]
    print(json.dumps({
        "metric": "scale_rehearsal",
        "value": round(n_frames / wall, 3),
        "unit": f"frames/s over {n_frames} frames ({kind})",
        "backend": jax.default_backend(),
        "wall_s": round(wall, 1),
        "ate_rmse": round(ate, 4),
        "kfs": len(m.keyframes),
        "kf_pool_cap": cfg.map.max_keyframes,
        "pts": int(m.n_points),
        "texts": int(m.n_texts),
        "loops_closed": len(slam.loop_closer.closed_loops)
        if slam.loop_closer else 0,
        "saturation_drops": dict(m.saturation_drops),
        "steady_median_ms_by_100": meds,
        "rss_mb_final": _host_rss_mb(),
        "dev_mb_final": _device_mb(),
        "snapshots": snapshots,
    }))


if __name__ == "__main__":
    main()
