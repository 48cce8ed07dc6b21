"""Multi-seed paired-ATE A/B harness (VERDICT r1 #10, VERDICT r2 next #3/#5).

Two experiments share the machinery — `2 arms x N seeds` child subprocesses,
each running the FULL pipeline end-to-end on an independently rendered world
(different textures, boxes, geometry per seed), one JSON summary line with
per-seed paired ATEs:

  --mode sampler   bf16 vs exact photometric sampling. The grouped Pallas
      region sampler (ops/pallas_kernels.py) defaults to single-pass bf16
      matmuls for its bilinear row-combine — worth ~20% of BA throughput
      over the exact 6-pass HIGHEST mode, at ~1 gray of absolute sampling
      error. The kernel only engages on TPU, so non-TPU children are
      dropped (a CPU pair would be a falsely-confirming zero diff).
      Env hook: TEXTSLAM_SAMPLER_PRECISION (solver/ba.py:_SAMPLER_PRECISION).

  --mode initba    joint vs sequential init BA. The reference's PyrIniBA
      optimizes pose+rho+theta jointly (src/optimizer.cc:1030); the shipped
      default runs a scene-only init BA followed by fixed-pose theta
      refinement (SolverConfig.joint_init_ba=False). This arm settles that
      deviation with paired full-sequence ATEs.
      Env hook: TEXTSLAM_JOINT_INIT_BA=1 (read in the child below).

Usage: python bench_precision.py [--mode sampler|initba] [n_seeds] [n_frames]
       python bench_precision.py --child <mode> <arm> <seed> <n_frames>
"""

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))

MODES = {
    # mode -> (arm_a, arm_b, env_var, env_value_for_b)
    "sampler": ("bf16", "highest", "TEXTSLAM_SAMPLER_PRECISION", "highest"),
    "initba": ("sequential", "joint", "TEXTSLAM_JOINT_INIT_BA", "1"),
}


def child(mode: str, arm: str, seed: int, n_frames: int) -> None:
    import jax

    from textslam_tpu.utils.cache import setup_compile_cache
    setup_compile_cache(_HERE)  # machine-keyed (VERDICT r4 weak #7)

    sys.path.insert(0, os.path.join(_HERE, "tests"))
    import dataclasses
    import numpy as np
    import synth
    from textslam_tpu.config import TextSLAMConfig, CameraConfig, SolverConfig
    from textslam_tpu.system import TextSLAM

    frames, dets, gt_poses, _ = synth.render_text_sequence(
        n_frames=n_frames, seed=seed, kind="lateral")
    solver = SolverConfig(
        joint_init_ba=os.environ.get("TEXTSLAM_JOINT_INIT_BA", "") == "1")
    cfg = TextSLAMConfig(
        no_text=False,
        solver=solver,
        camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX,
                            cy=synth.CY, width=synth.W, height=synth.H,
                            fps=10.0))
    slam = TextSLAM(cfg)
    for i in range(n_frames):
        slam.track_monocular(frames[i], float(i), detections=dets[i])
    traj = slam.tracker.trajectory
    est = np.stack([p for _, p in traj])
    ate = synth.ate_rmse([t for t, _ in traj], est, gt_poses)
    # init-window ATE: the first 10 frames isolate the init-BA choice
    n_init = min(10, len(traj))
    ate_init = synth.ate_rmse([t for t, _ in traj[:n_init]],
                              est[:n_init], gt_poses)
    print(json.dumps({
        "mode": mode,
        "arm": arm,
        "seed": seed,
        "backend": jax.default_backend(),
        "ate_rmse": round(float(ate), 6),
        "ate_init_window": round(float(ate_init), 6),
        "n_frames_tracked": len(traj),
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]))
        return

    args = sys.argv[1:]
    mode = "sampler"
    if args and args[0] == "--mode":
        mode = args[1]
        args = args[2:]
    arm_a, arm_b, env_var, env_val = MODES[mode]
    n_seeds = int(args[0]) if args else 3
    n_frames = int(args[1]) if len(args) > 1 else 30
    results = {}
    for arm in (arm_a, arm_b):
        env = dict(os.environ)
        env.pop(env_var, None)
        if arm == arm_b:
            env[env_var] = env_val
        for seed in range(n_seeds):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     mode, arm, str(seed), str(n_frames)],
                    capture_output=True, text=True, timeout=3600, env=env)
            except subprocess.TimeoutExpired:
                # tunneled-TPU runs occasionally wedge (dropped tunnel);
                # skip the pair rather than losing the whole sweep
                print(f"# child timed out (arm={arm} seed={seed}); "
                      "skipping pair", file=sys.stderr)
                continue
            if r.returncode != 0:
                print(f"# child failed (arm={arm} seed={seed}):\n"
                      + r.stderr[-2000:], file=sys.stderr)
                continue
            try:
                d = json.loads(r.stdout.strip().splitlines()[-1])
            except (IndexError, json.JSONDecodeError) as e:
                print(f"# child output unparseable (arm={arm} seed={seed}): "
                      f"{e}", file=sys.stderr)
                continue
            if mode == "sampler" and d.get("backend") != "tpu":
                # the grouped kernel being A/B'd only engages on TPU
                # (solver/ba.py _sample_text_values); a CPU/GPU pair would
                # be a falsely-confirming zero diff — drop it
                print(f"# dropping pair: backend={d.get('backend')} != tpu "
                      f"(arm={arm} seed={seed})", file=sys.stderr)
                continue
            results[(arm, seed)] = d
            print(f"# arm={arm} seed={seed} ate={d['ate_rmse']} "
                  f"init={d['ate_init_window']} "
                  f"frames={d['n_frames_tracked']} backend={d['backend']}",
                  file=sys.stderr)

    pairs = []
    for seed in range(n_seeds):
        a = results.get((arm_a, seed))
        b = results.get((arm_b, seed))
        if a and b:
            pairs.append({
                "seed": seed,
                f"ate_{arm_a}": a["ate_rmse"],
                f"ate_{arm_b}": b["ate_rmse"],
                f"ate_init_{arm_a}": a["ate_init_window"],
                f"ate_init_{arm_b}": b["ate_init_window"],
                "diff": round(a["ate_rmse"] - b["ate_rmse"], 6),
                "diff_init": round(
                    a["ate_init_window"] - b["ate_init_window"], 6),
            })
    diffs = [p["diff"] for p in pairs]
    print(json.dumps({
        "metric": f"{mode}_ate_ab",
        "arms": [arm_a, arm_b],
        "pairs": pairs,
        "mean_paired_diff": round(sum(diffs) / len(diffs), 6) if diffs else None,
        "max_abs_paired_diff": round(max(abs(d) for d in diffs), 6) if diffs else None,
        "note": f"positive diff = {arm_a} worse; compare against the "
                "~mm-scale ATE magnitudes to judge significance",
    }))


if __name__ == "__main__":
    main()
