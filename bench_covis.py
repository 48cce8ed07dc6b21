"""Covisibility-product scale measurement (VERDICT r2 next #8).

Measures the M1 rebuild — M = inc @ inc.T over the [K, P] observation
incidence — at the default pool caps (K=512 keyframes, P=32768 points) and
below, on three paths:
  host-numpy    int32 matmul + fill_diagonal
  host-native   the threaded C++ product (native/_native.cpp)
  device        the keyframe-axis-sharded MXU matmul
                (parallel/covis_sharded.py) incl. host<->device transfer

Prints one JSON line per (K, path) with median milliseconds. The decision
this measurement backs is recorded in PARITY.md ("map-axis sharding").
"""

import json
import time

import numpy as np


def timeit(fn, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import jax
    from textslam_tpu import native
    from textslam_tpu.parallel import covis_sharded

    rng = np.random.default_rng(0)
    n_dev = jax.device_count()
    mesh = covis_sharded.make_mesh(n_dev)
    backend = jax.default_backend()
    P = 32768
    for K in (64, 128, 256, 512):
        # realistic density: each point observed by a handful of KFs
        inc = rng.random((K, P)) < (8.0 / K)

        def host_numpy():
            M = inc.astype(np.int32) @ inc.astype(np.int32).T
            np.fill_diagonal(M, 0)
            return M

        def host_native():
            return native.covis_product(inc)

        def device():
            return covis_sharded.covis_product(inc, mesh)

        device()  # compile once outside the timing
        res = {
            "metric": "covis_rebuild_ms",
            "K": K,
            "P": P,
            "backend": backend,
            "devices": n_dev,
            "host_numpy_ms": round(timeit(host_numpy), 3),
            "host_native_ms": round(timeit(host_native), 3),
            "device_sharded_ms": round(timeit(device), 3),
        }
        print(json.dumps(res))


if __name__ == "__main__":
    main()
