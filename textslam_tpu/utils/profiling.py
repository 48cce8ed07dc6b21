"""Per-phase timing + device tracing (the observability subsystem).

The reference measures every phase with std::chrono and then discards the
numbers (SURVEY.md §5: timings collected into locals/vTimePerImg, never
printed). Here phases aggregate into a process-wide registry, can be dumped
as a table, and an optional jax.profiler trace captures device timelines.

Usage:
    from textslam_tpu.utils.profiling import phase, report
    with phase("pose_optim"):
        ...
    print(report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

_STATS: Dict[str, list] = defaultdict(lambda: [0, 0.0, 0.0])  # n, total, max


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        st = _STATS[name]
        st[0] += 1
        st[1] += dt
        st[2] = max(st[2], dt)


def report(reset: bool = False) -> str:
    rows = ["phase                          n      total_s   mean_ms    max_ms"]
    for name in sorted(_STATS, key=lambda n: -_STATS[n][1]):
        n, total, mx = _STATS[name]
        rows.append(
            f"{name:<28} {n:>5} {total:>10.2f} {total / max(n, 1) * 1e3:>9.1f} {mx * 1e3:>9.1f}"
        )
    if reset:
        _STATS.clear()
    return "\n".join(rows)


def stats() -> Dict[str, dict]:
    return {
        k: {"n": v[0], "total_s": v[1], "mean_ms": v[1] / max(v[0], 1) * 1e3, "max_ms": v[2] * 1e3}
        for k, v in _STATS.items()
    }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace wrapper (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
