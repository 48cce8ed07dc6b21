"""Per-stage FLOP/byte accounting + MFU (VERDICT r4 next #4).

XLA's own cost model (`compiled.cost_analysis()`) counts the flops and
bytes of each compiled stage at its real pipeline shape; combined with
measured wall-clock this yields achieved TFLOPS, achieved bandwidth, and
MFU against the chip peaks — and classifies each stage as latency-,
bandwidth-, or compute-bound. Feeds the utilization table in BASELINE.md;
bench.py reports the headline solver MFU in its extras.

Peaks (TPU v5e public specs): 197 TFLOPS bf16, ~99 TFLOPS f32 (MXU at
half rate), 819 GB/s HBM.

Usage: python bench_roofline.py
"""

import json
import sys
import time

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 99e12
V5E_HBM_GBS = 819e9


def analyze(name, jitted, args, kwargs, n_time=20, per_call_divisor=1):
    import numpy as np

    lowered = jitted.lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    try:
        ma = compiled.memory_analysis()
        temp_mb = ma.temp_size_in_bytes / 1e6
        arg_mb = ma.argument_size_in_bytes / 1e6
    except Exception:
        temp_mb = arg_mb = float("nan")
    out = jitted(*args, **kwargs)
    jitted_tree_block(out)
    times = []
    for _ in range(n_time):
        t0 = time.perf_counter()
        out = jitted(*args, **kwargs)
        jitted_tree_block(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "stage": name,
        "wall_ms": round(dt * 1e3, 2),
        "gflops_per_call": round(flops / 1e9, 2),
        "gbytes_per_call": round(bytes_acc / 1e9, 3),
        "achieved_tflops": round(flops / dt / 1e12, 2),
        "achieved_gbs": round(bytes_acc / dt / 1e9, 1),
        "mfu_bf16_pct": round(100 * flops / dt / V5E_PEAK_BF16, 2),
        "mfu_f32_pct": round(100 * flops / dt / V5E_PEAK_F32, 2),
        "hbm_util_pct": round(100 * bytes_acc / dt / V5E_HBM_GBS, 1),
        "xla_temp_mb": round(temp_mb, 1),
        "xla_arg_mb": round(arg_mb, 1),
        "per_iter_divisor": per_call_divisor,
    }


def jitted_tree_block(out):
    import jax

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import os

    import jax

    here = os.path.dirname(os.path.abspath(__file__))
    from textslam_tpu.utils.cache import setup_compile_cache

    setup_compile_cache(here)

    import functools

    import numpy as np

    from __graft_entry__ import _synthetic_problem
    from textslam_tpu.solver import ba

    rows = []

    # --- the flagship: windowed joint BA (bench.py shape), 10 LM iters ---
    problem = _synthetic_problem(
        n_kf=20, n_pts=8192, obs_per_kf=512, n_text=32, text_feat=64,
        with_text=True)
    solve = functools.partial(ba.solve_ba, n_iters=10, text_pair_feat=64)
    jit_solve = jax.jit(lambda p: solve(p))
    rows.append(analyze("solve_ba (20-KF joint, 10 LM iters)",
                        jit_solve, (problem,), {}, per_call_divisor=11))

    # --- scene-only global BA (segment-sum camera path) at loop-time
    # scales: the VERDICT r4 missing-#1 wall was O(obs*K^2) one-hot
    # assembly (2.45 GB XLA temp at K=512/O=131k); these rows record the
    # large-K path's wall-clock + XLA temp at K=128/256/512 ---
    for n_kf, n_pts, opk in ((128, 8192, 256), (256, 16384, 512),
                             (512, 32768, 512)):
        gprob = _synthetic_problem(n_kf=n_kf, n_pts=n_pts, obs_per_kf=opk,
                                   with_text=False)
        gsolve = jax.jit(lambda p: ba.solve_ba(p, n_iters=10))
        rows.append(analyze(
            f"solve_ba global K={n_kf} scene-only O={n_kf * opk} (10 iters)",
            gsolve, (gprob,), {}, n_time=5, per_call_divisor=11))

    # --- landmark-only pass (no-free-poses fast path) at K=512 ---
    lprob = gprob._replace(pose_free=gprob.pose_free & False)
    lsolve = jax.jit(lambda p: ba.solve_ba(p, n_iters=10,
                                           no_free_poses=True))
    rows.append(analyze("solve_ba landmark-only K=512 (no-free-poses)",
                        lsolve, (lprob,), {}, n_time=5, per_call_divisor=11))

    for r in rows:
        print(json.dumps(r), file=sys.stderr)
    print(json.dumps({"metric": "roofline", "backend": jax.default_backend(),
                      "peaks": {"bf16_tflops": 197, "f32_tflops": 99,
                                "hbm_gbs": 819},
                      "stages": rows}))


if __name__ == "__main__":
    main()
