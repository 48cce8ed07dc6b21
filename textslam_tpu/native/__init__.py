"""Native host runtime (C++ extension) with transparent python fallbacks.

Builds `_native.cpp` on first import (g++ via setuptools-free direct compile
— no network, no pip). If the toolchain is unavailable the numpy fallbacks
keep everything working; `HAVE_NATIVE` reports which path is active.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_native.so")
_SRC = os.path.join(_HERE, "_native.cpp")

_native = None


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    inc = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{inc}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


if os.environ.get("TEXTSLAM_NO_NATIVE", "") not in ("1", "true"):
    if _build():
        try:
            sys.path.insert(0, _HERE)
            import _native  # type: ignore

            sys.path.pop(0)
        except Exception:
            _native = None
            sys.path.pop(0)

HAVE_NATIVE = _native is not None


def levenshtein_batch(a: np.ndarray, alen: np.ndarray, b: np.ndarray, blen: np.ndarray) -> np.ndarray:
    """All-pairs edit distance. a [Q, L], b [T, L] int32 codepoints."""
    Q, L = a.shape
    T = b.shape[0]
    if HAVE_NATIVE:
        out = _native.levenshtein_batch(
            np.ascontiguousarray(a, np.int32),
            np.ascontiguousarray(alen, np.int32),
            np.ascontiguousarray(b, np.int32),
            np.ascontiguousarray(blen, np.int32),
            Q, T, L,
        )
        return np.frombuffer(out, np.int32).reshape(Q, T).copy()
    # python fallback
    out = np.zeros((Q, T), np.int32)
    for q in range(Q):
        aw = a[q, : alen[q]]
        for t in range(T):
            bw = b[t, : blen[t]]
            dp = list(range(len(bw) + 1))
            for i, ca in enumerate(aw):
                new = [i + 1]
                for j, cb in enumerate(bw):
                    new.append(min(dp[j + 1] + 1, new[-1] + 1, dp[j] + (ca != cb)))
                dp = new
            out[q, t] = dp[-1]
    return out


def covis_product(inc: np.ndarray) -> np.ndarray:
    """Symmetric shared-observation counts from [K, P] bool incidence."""
    K, P = inc.shape
    if HAVE_NATIVE and K > 1:
        out = _native.covis_product(
            np.ascontiguousarray(inc, np.uint8), K, P
        )
        return np.frombuffer(out, np.int32).reshape(K, K).copy()
    M = (inc.astype(np.int32) @ inc.astype(np.int32).T)
    np.fill_diagonal(M, 0)
    return M


class Prefetcher:
    """Background file-bytes prefetcher (native thread when available)."""

    def __init__(self, paths, lookahead: int = 8):
        self._paths = list(paths)
        if HAVE_NATIVE:
            self._impl = _native.Prefetcher(self._paths, lookahead)
        else:
            self._impl = None

    def get(self, i: int) -> bytes:
        if self._impl is not None:
            return self._impl.get(i)
        with open(self._paths[i], "rb") as f:
            return f.read()
