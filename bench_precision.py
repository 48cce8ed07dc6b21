"""Multi-seed ATE A/B: bf16 vs exact photometric sampling (VERDICT r1 #10).

The grouped Pallas region sampler (ops/pallas_kernels.py) defaults to
single-pass bf16 matmuls for its bilinear row-combine — worth ~20% of BA
throughput over the exact 6-pass HIGHEST mode, at the cost of ~1 gray of
absolute sampling error. Round-1 A/B evidence was a single rendered
sequence, where run-to-run variance dominates; this harness settles the
question with N independently rendered worlds (different textures, boxes,
and geometry per seed) run end-to-end through the FULL pipeline under both
precisions on the real TPU (the kernel only engages on the TPU backend).

Parent mode runs `2 precisions x N seeds` child subprocesses (env var
TEXTSLAM_SAMPLER_PRECISION flips the mode, solver/ba.py:_SAMPLER_PRECISION)
and prints one JSON summary line with per-seed paired ATEs and the
mean/max paired difference.

Usage: python bench_precision.py [n_seeds] [n_frames]
       python bench_precision.py --child <seed> <n_frames>   (internal)
"""

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def child(seed: int, n_frames: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    sys.path.insert(0, os.path.join(_HERE, "tests"))
    import numpy as np
    import synth
    from textslam_tpu.config import TextSLAMConfig, CameraConfig
    from textslam_tpu.system import TextSLAM

    frames, dets, gt_poses, _ = synth.render_text_sequence(
        n_frames=n_frames, seed=seed, kind="lateral")
    cfg = TextSLAMConfig(
        no_text=False,
        camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX,
                            cy=synth.CY, width=synth.W, height=synth.H,
                            fps=10.0))
    slam = TextSLAM(cfg)
    for i in range(n_frames):
        slam.track_monocular(frames[i], float(i), detections=dets[i])
    traj = slam.tracker.trajectory
    est = np.stack([p for _, p in traj])
    ate = synth.ate_rmse([t for t, _ in traj], est, gt_poses)
    print(json.dumps({
        "seed": seed,
        "precision": os.environ.get("TEXTSLAM_SAMPLER_PRECISION", "bf16"),
        "backend": jax.default_backend(),
        "ate_rmse": round(float(ate), 6),
        "n_kf": len(traj),
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    results = {}
    for prec in ("bf16", "highest"):
        env = dict(os.environ)
        if prec == "highest":
            env["TEXTSLAM_SAMPLER_PRECISION"] = "highest"
        else:
            env.pop("TEXTSLAM_SAMPLER_PRECISION", None)
        for seed in range(n_seeds):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(seed), str(n_frames)],
                capture_output=True, text=True, timeout=1800, env=env)
            if r.returncode != 0:
                print(f"# child failed (prec={prec} seed={seed}):\n"
                      + r.stderr[-2000:], file=sys.stderr)
                continue
            d = json.loads(r.stdout.strip().splitlines()[-1])
            results[(prec, seed)] = d
            print(f"# prec={prec} seed={seed} ate={d['ate_rmse']} "
                  f"kf={d['n_kf']} backend={d['backend']}", file=sys.stderr)

    pairs = []
    for seed in range(n_seeds):
        a = results.get(("bf16", seed))
        b = results.get(("highest", seed))
        if a and b:
            pairs.append({"seed": seed, "ate_bf16": a["ate_rmse"],
                          "ate_highest": b["ate_rmse"],
                          "diff": round(a["ate_rmse"] - b["ate_rmse"], 6)})
    diffs = [p["diff"] for p in pairs]
    print(json.dumps({
        "metric": "sampler_precision_ate_ab",
        "pairs": pairs,
        "mean_paired_diff": round(sum(diffs) / len(diffs), 6) if diffs else None,
        "max_abs_paired_diff": round(max(abs(d) for d in diffs), 6) if diffs else None,
        "note": "positive diff = bf16 worse; compare against the ~mm-scale "
                "ATE magnitudes to judge significance",
    }))


if __name__ == "__main__":
    main()
