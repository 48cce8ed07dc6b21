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

    # NOTE: the axon sitecustomize overrides the JAX_PLATFORMS env var; a
    # CPU A/B run (RSS attribution, gate debugging) must force the platform
    # through jax.config exactly like tests/conftest.py does
    if "--cpu" in sys.argv[1:]:
        jax.config.update("jax_platforms", "cpu")

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
        path_kind = "ring"
    elif kind == "ring_drift":
        # engineered-drift loop fixture: smaller text boxes (the seam
        # re-association threshold drops to ~10 cm at 1.8 m depth) + a
        # degraded mid-lap stretch (detections dropped, frames darkened/
        # blurred/noised) so the revisit carries REAL accumulated drift
        world = synth.ring_world(seed=3, box_px=((80, 130), (50, 80)))
        path_kind = "ring"
    else:
        world = synth.TextWorld(seed=3, boxes_per_plane=4)
        path_kind = kind
    poses = synth.camera_path(n_frames, path_kind)
    frames = [world.render(p) for p in poses]
    dets = [world.detections(p) for p in poses]
    if kind == "ring_drift":
        g = synth.degrade_schedule(n_frames)
        rng = np.random.default_rng(9)
        # unmodeled focal ramp (thermal zoom): inside the detection-free
        # zone the TRUE focal length drifts up to +5% while the pipeline
        # keeps the nominal calibration — the classic systematic source of
        # monocular scale drift that Sim3 loop closure exists to repair.
        # Confined to g >= 0.3 so GT-projected detections (which use the
        # nominal intrinsics) are never rendered inconsistently.
        eps = 0.04 * np.clip((g - 0.3) / 0.7, 0.0, 1.0)
        out = []
        for f, p, gi, ei in zip(frames, poses, g, eps):
            if ei > 0:
                Km = synth.K.copy()
                Km[0, 0] *= 1.0 + ei
                Km[1, 1] *= 1.0 + ei
                f = world.render(p, K_mat=Km)
            out.append(synth.degrade_frame(f, rng, float(gi)))
        frames = out
        dets = [d if gi < 0.3 else [] for d, gi in zip(dets, g)]
        n_deg = int((g > 0).sum())
        print(f"[scale] degraded stretch: {n_deg} frames "
              f"(dets dropped on {int((g >= 0.3).sum())}, "
              f"peak focal ramp {eps.max():.3f})", file=sys.stderr)

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
                "map_host_mb": {k: round(v / 1e6, 0)
                                for k, v in m.host_bytes().items()},
            }
            snapshots.append(snap)
            print(f"[scale] {snap}", file=sys.stderr)
            # per-window phase table: attributes any steady-median growth to
            # a specific pipeline stage (reset so each window stands alone)
            from textslam_tpu.utils.profiling import report as phase_report

            print(phase_report(reset=True), file=sys.stderr)
            window = []
    wall = time.perf_counter() - t_start

    traj = slam.tracker.trajectory
    ts = [t for t, _ in traj]
    est = np.stack([p for _, p in traj])
    ate = synth.ate_rmse(ts, est, poses)

    # drift accounting for the loop fixtures: align the FIRST clean stretch
    # of the estimate to GT, then measure the positional error just before
    # the seam (accumulated drift the revisit must overcome) and at the end
    # (small again iff re-association or a loop closure repaired it)
    def _aligned_err_at(frac: float) -> float:
        from textslam_tpu.geometry import sim3 as _s3
        from textslam_tpu.geometry import se3 as _se3
        import jax.numpy as jnp
        n_fit = min(80, len(est) // 3)
        estC = np.array(_se3.apply(_se3.inverse(jnp.asarray(est)),
                                   jnp.zeros((len(est), 3))))
        gt_idx = [int(round(t)) for t in ts]
        gtC = np.array(_se3.apply(_se3.inverse(jnp.asarray(poses[gt_idx])),
                                  jnp.zeros((len(gt_idx), 3))))
        S = _s3.horn_alignment(jnp.asarray(gtC[:n_fit]),
                               jnp.asarray(estC[:n_fit]))
        al = np.array(_s3.apply(S, jnp.asarray(estC)))
        i = min(int(frac * len(est)), len(est) - 1)
        return float(np.linalg.norm(al[i] - gtC[i]))

    drift_pre_seam = _aligned_err_at(0.82)
    drift_final = _aligned_err_at(1.0)

    # keyframe-trajectory ATE from the MAP's poses: unlike the online
    # trajectory (recorded at track time, never rewritten), kf_pose reflects
    # every loop correction and global pass — the reference's
    # SaveKeyFrameTrajectoryTUM analog
    kf_ts = [kf.timestamp for kf in m.keyframes]
    kf_est = np.stack([m.kf_pose[kf.kid] for kf in m.keyframes])
    kf_ate = synth.ate_rmse(kf_ts, kf_est, poses)

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
        "drift_pre_seam_m": round(drift_pre_seam, 4),
        "drift_final_m": round(drift_final, 4),
        "kf_ate_rmse": round(kf_ate, 4),
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
