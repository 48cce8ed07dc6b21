"""End-to-end tracking throughput benchmark (supplementary to bench.py).

Runs the full pipeline — frame build (pyramid + Sobel + ORB), map matching,
pose optimization, text pipeline, keyframe insertion + windowed joint BA —
over a rendered synthetic sequence with exact ground truth, and reports:

- compile/warmup wall time vs STEADY-STATE frames/s (median + mean)
- the per-phase breakdown from utils.profiling over the steady window only
- the measured dispatch round-trip of this JAX backend (a trivial op's
  host->device->host latency) — on a tunneled TPU this is the RPC floor
  every dispatch pays, which bounds achievable fps independently of kernel
  speed
- Sim3-aligned ATE as a correctness guard

Prints ONE JSON line. The reference publishes no FPS numbers (per-frame
timings are collected and discarded, main.cpp:87-90), so there is no
vs_baseline divisor; this benchmark tracks OUR regression curve and feeds
the e2e timing table in BASELINE.md (VERDICT r2 next #3).

Usage: python bench_e2e.py [n_frames]
"""

import json
import sys
import time


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    import os
    import jax
    import jax.numpy as jnp
    # persistent compile cache: TPU compiles through the tunnel cost
    # 20-40s each; cache them across runs (same dir the test suite uses)
    here = os.path.dirname(os.path.abspath(__file__))
    from textslam_tpu.utils.cache import setup_compile_cache
    setup_compile_cache(here)  # machine-keyed (VERDICT r4 weak #7)

    sys.path.insert(0, "tests")
    import numpy as np
    import synth
    from textslam_tpu.config import TextSLAMConfig, CameraConfig
    from textslam_tpu.system import TextSLAM
    from textslam_tpu.utils import profiling

    # dispatch round-trip floor of this backend (tunnel RPC on axon)
    x = jnp.zeros(8)
    jnp.add(x, 1.0).block_until_ready()
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jnp.add(x, 1.0).block_until_ready()
        rtts.append((time.perf_counter() - t0) * 1e3)
    dispatch_rtt_ms = float(np.median(rtts))

    frames, dets, gt_poses, _ = synth.render_text_sequence(
        n_frames=n_frames, seed=3, kind="lateral"
    )

    cfg = TextSLAMConfig(
        no_text=False,
        camera=CameraConfig(
            fx=synth.FX, fy=synth.FY, cx=synth.CX, cy=synth.CY,
            width=synth.W, height=synth.H, fps=10.0,
        ),
    )
    slam = TextSLAM(cfg)

    # warm/compile window (first KF insertions compile the BA programs)
    warm = min(12, n_frames // 3)
    t_warm0 = time.perf_counter()
    for i in range(warm):
        slam.track_monocular(frames[i], float(i), detections=dets[i])
    compile_s = time.perf_counter() - t_warm0

    # steady state: reset the phase registry so the table is steady-only.
    # Long runs (>= 200 frames) additionally emit per-100-frame snapshots of
    # frame time + map counts + host/device memory (VERDICT r4 next #6;
    # bench_scale.py is the full cap-scale rehearsal)
    from bench_scale import _device_mb, _host_rss_mb

    profiling.report(reset=True)
    per_frame = []
    snapshots = []
    t0 = time.perf_counter()
    for i in range(warm, n_frames):
        t1 = time.perf_counter()
        slam.track_monocular(frames[i], float(i), detections=dets[i])
        per_frame.append(time.perf_counter() - t1)
        if n_frames >= 200 and (i + 1) % 100 == 0:
            w = per_frame[-100:]
            snapshots.append({
                "frame": i + 1,
                "med_ms": round(float(np.median(w)) * 1e3, 1),
                "kfs": len(slam.map.keyframes),
                "pts": int(slam.map.n_points),
                "texts": int(slam.map.n_texts),
                "rss_mb": round(_host_rss_mb(), 0),
                "dev_mb": round(_device_mb(), 0),
            })
    dt = time.perf_counter() - t0
    fps = (n_frames - warm) / dt

    phases = {
        k: {"n": v["n"], "mean_ms": round(v["mean_ms"], 1)}
        for k, v in sorted(profiling.stats().items(),
                           key=lambda kv: -kv[1]["total_s"])
    }

    traj = slam.tracker.trajectory
    ts = [t for t, _ in traj]
    est = np.stack([p for _, p in traj])
    ate = synth.ate_rmse(ts, est, gt_poses)

    print(
        json.dumps(
            {
                "metric": "e2e_frames_per_sec",
                "value": round(fps, 2),
                "unit": f"frames/s (640x480, text on, steady state over {n_frames - warm} frames)",
                "ate_rmse": round(ate, 4),
                "backend": jax.default_backend(),
                "compile_warmup_s": round(compile_s, 1),
                "steady_ms_per_frame_median": round(
                    float(np.median(per_frame)) * 1e3, 1),
                "steady_ms_per_frame_mean": round(
                    float(np.mean(per_frame)) * 1e3, 1),
                "dispatch_rtt_ms": round(dispatch_rtt_ms, 2),
                "phases_steady": phases,
                **({"snapshots": snapshots} if snapshots else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
