"""End-to-end tracking throughput benchmark (supplementary to bench.py).

Runs the full pipeline — frame build (pyramid + Sobel + ORB), map matching,
pose optimization, text pipeline, keyframe insertion + windowed joint BA —
over a rendered synthetic sequence with exact ground truth, and reports
frames/s plus the Sim3-aligned ATE as a correctness guard.

Prints ONE JSON line like bench.py. The reference publishes no FPS numbers
(per-frame timings are collected and discarded, main.cpp:87-90), so there is
no vs_baseline divisor here; this benchmark tracks OUR regression curve.

Usage: python bench_e2e.py [n_frames]
"""

import json
import sys
import time


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60

    import os
    import jax
    # persistent compile cache: TPU compiles through the tunnel cost
    # 20-40s each; cache them across runs (same dir the test suite uses)
    here = os.path.dirname(os.path.abspath(__file__))
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    sys.path.insert(0, "tests")
    import synth
    from textslam_tpu.config import TextSLAMConfig, CameraConfig
    from textslam_tpu.system import TextSLAM

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

    # warm the jit caches on the first few frames, then time steady state
    warm = min(12, n_frames // 3)
    for i in range(warm):
        slam.track_monocular(frames[i], float(i), detections=dets[i])
    t0 = time.perf_counter()
    for i in range(warm, n_frames):
        slam.track_monocular(frames[i], float(i), detections=dets[i])
    dt = time.perf_counter() - t0
    fps = (n_frames - warm) / dt

    traj = slam.tracker.trajectory
    ts = [t for t, _ in traj]
    import numpy as np

    est = np.stack([p for _, p in traj])
    ate = synth.ate_rmse(ts, est, gt_poses)

    print(
        json.dumps(
            {
                "metric": "e2e_frames_per_sec",
                "value": round(fps, 2),
                "unit": f"frames/s (640x480, text pipeline on, steady state over {n_frames - warm} frames)",
                "ate_rmse": round(ate, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
