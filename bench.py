"""Benchmark: windowed joint point+text BA iteration throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The problem shape mirrors the reference's LocalBundleAdjustment hot loop
(SURVEY.md §2.3 PyrBA): a 20-KF window, ~4k scene reprojection residuals and
~8k 8-dim photometric text residuals per level, 10 LM iterations per level
over 3 levels. The reference runs this single-threaded with CENTRAL numeric
diff (2 extra cost evals x 14 params per 8-pixel residual per iteration,
src/optimizer.cc:1598-1607, include/nume_BAText.h:98).

vs_baseline: the reference repo publishes no numbers (BASELINE.md). The
divisor below (30 BA iters/s) is an engineering estimate of the reference's
single-thread Ceres iteration rate on this problem size, to be replaced by a
measured value once the C++ reference can be run on the TextSLAM dataset.
The driver-stated target is >= 5x => vs_baseline >= 5.
"""

import json
import time

import numpy as np

REFERENCE_BA_ITERS_PER_SEC_ESTIMATE = 30.0


def main():
    import jax
    from textslam_tpu.solver import ba
    from __graft_entry__ import _synthetic_problem

    problem = _synthetic_problem(
        n_kf=20, n_pts=8192, obs_per_kf=512, n_text=32, text_feat=64, with_text=True
    )

    n_iters = 10

    def run():
        state = ba.solve_ba(problem, n_iters=n_iters)
        state.poses.block_until_ready()
        return state

    # warmup/compile
    run()
    # timed steady state
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = time.perf_counter() - t0
    iters_per_sec = reps * n_iters / dt

    print(
        json.dumps(
            {
                "metric": "ba_iters_per_sec",
                "value": round(iters_per_sec, 2),
                "unit": "LM iterations/s (20-KF window, 10240 scene + 20480 text residual rows)",
                "vs_baseline": round(iters_per_sec / REFERENCE_BA_ITERS_PER_SEC_ESTIMATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
