"""Batched Levenshtein distance for semantic loop detection.

Reference: tool::Levenshtein DP (src/tool.cc:264-299), called for every
(query word, map word) pair during loop detection
(src/loopClosing.cc:175-195) — the loop-time hot spot. Here the DP runs as a
wavefront over fixed-size padded codepoint arrays, batched over all pairs at
once: the [Q, T] pair matrix is one vmapped scan, not a double loop.

Score convention matches the reference: score = (maxlen - dist) / maxlen.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def encode(words, max_len: int):
    """Encode python strings as padded codepoint arrays [N, max_len] + lengths.

    Codepoints, NOT bytes — a documented improvement over the reference:
    tool::LevenshteinDist (src/tool.cc:264-299) operates on std::string
    BYTES, so one CJK character difference costs up to 3 byte-edits and the
    (maxlen-dist)/maxlen score is computed over byte lengths; per-character
    distances score CJK strings on the same scale as Latin ones. (The
    reference's UTF-8 awareness is only in language CLASSIFICATION,
    src/tool.cc:163-215.)"""
    N = len(words)
    arr = np.zeros((N, max_len), np.int32)
    lens = np.zeros(N, np.int32)
    for i, w in enumerate(words):
        cps = [ord(c) for c in w[:max_len]]
        arr[i, : len(cps)] = cps
        lens[i] = len(cps)
    return arr, lens


@functools.partial(jax.jit, static_argnames=())
def levenshtein_matrix(a: jnp.ndarray, alen: jnp.ndarray, b: jnp.ndarray, blen: jnp.ndarray):
    """All-pairs edit distances.

    a [Q, L], b [T, L] padded codepoints with lengths -> dist [Q, T] int32.
    Row-by-row DP under lax.scan; each scan step updates the whole [Q, T, L+1]
    frontier in parallel on the VPU.
    """
    Q, L = a.shape
    T = b.shape[0]
    cols = jnp.arange(L + 1, dtype=jnp.int32)

    # dp[j] for j in 0..L over b-prefixes; scan over characters of a
    init = jnp.broadcast_to(cols[None, None, :], (Q, T, L + 1)).astype(jnp.int32)

    def step(prev, i):
        # prev: [Q, T, L+1] = distances for a-prefix length i
        ai = a[:, i]  # [Q]
        sub_cost = (ai[:, None, None] != b[None, :, :]).astype(jnp.int32)  # [Q,T,L]
        # new[0] = i + 1
        # new[j] = min(prev[j] + 1, new[j-1] + 1, prev[j-1] + sub)
        # the new[j-1] dependency is a prefix-min recurrence:
        # new[j] = min_{k<=j} ( (j - k) + cand[k] ) with
        # cand[0] = i+1, cand[k] = min(prev[k] + 1, prev[k-1] + sub[k-1])
        cand = jnp.minimum(prev[..., 1:] + 1, prev[..., :-1] + sub_cost)  # [Q,T,L]
        cand = jnp.concatenate(
            [jnp.full((Q, T, 1), i + 1, jnp.int32), cand], axis=-1
        )  # [Q,T,L+1]
        # prefix-min of (cand[k] - k), then add j
        shifted = cand - cols[None, None, :]
        run = jax.lax.associative_scan(jnp.minimum, shifted, axis=-1)
        new = run + cols[None, None, :]
        # rows beyond alen keep previous value (handled at gather time)
        return new, new

    _, outs = jax.lax.scan(step, init, jnp.arange(L))
    # outs: [L, Q, T, L+1]; for each (q, t): outs[alen[q]-1, q, t, blen[t]]
    # alen==0 -> distance = blen
    qi = jnp.arange(Q)
    d_full = outs[jnp.maximum(alen - 1, 0)[:, None], qi[:, None], jnp.arange(T)[None, :], blen[None, :]]
    d_empty = jnp.broadcast_to(blen[None, :], (Q, T))
    return jnp.where(alen[:, None] > 0, d_full, d_empty).astype(jnp.int32)


def similarity_scores(dist: jnp.ndarray, alen: jnp.ndarray, blen: jnp.ndarray):
    """(maxlen - dist) / maxlen, the reference's word score
    (src/loopClosing.cc:190-193)."""
    maxlen = jnp.maximum(alen[:, None], blen[None, :]).clip(1)
    return (maxlen - dist).astype(jnp.float32) / maxlen.astype(jnp.float32)
