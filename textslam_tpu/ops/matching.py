"""Batched binary descriptor matching.

The reference matches ORB descriptors with serial Hamming loops over grid
buckets (DescriptorDistance + GetFeaturesInArea, src/frame.cc:415-468,
src/tracking.cc:1045-1273). On TPU the whole N1xN2 distance matrix is one
XOR + population_count reduction; spatial windowing, level gates and
already-matched exclusions become additive masks on that matrix. Compute is
dense but tiny (popcounts on int32 lanes), and everything fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = 10_000  # > max possible Hamming distance (256)


def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances between [N1, W] and [N2, W] uint32
    descriptors -> [N1, N2] int32.

    On TPU this dispatches to the hand-written tiled Pallas kernel
    (ops.pallas_kernels, ~2x over the XLA lowering); elsewhere the dense
    XLA path runs."""
    if _use_pallas():
        from .pallas_kernels import hamming_matrix_pallas

        return hamming_matrix_pallas(d1, d2)
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jax.lax.population_count(x).astype(jnp.int32).sum(axis=-1)


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def masked_best2(dist: jnp.ndarray, mask: jnp.ndarray):
    """Best and second-best matches along axis 1 under a validity mask.

    Returns (best_idx [N1], best_d [N1], second_d [N1]). Invalid pairs get
    distance INF.
    """
    d = jnp.where(mask, dist, INF)
    neg = -d
    vals, idx = jax.lax.top_k(neg, 2)  # top_k over last axis
    best_d = -vals[:, 0]
    second_d = -vals[:, 1]
    return idx[:, 0], best_d, second_d


def window_mask(uv1: jnp.ndarray, uv2: jnp.ndarray, radius) -> jnp.ndarray:
    """[N1, N2] mask: |u1-u2|<=r and |v1-v2|<=r. radius may be scalar or
    per-row [N1] (the reference scales the window by octave,
    src/tracking.cc:1347-1411)."""
    du = jnp.abs(uv1[:, None, 0] - uv2[None, :, 0])
    dv = jnp.abs(uv1[:, None, 1] - uv2[None, :, 1])
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    return (du <= r) & (dv <= r)


def level_mask(l1: jnp.ndarray, l2: jnp.ndarray, max_diff: int | None = 0) -> jnp.ndarray:
    """[N1, N2] mask of pyramid-level agreement (None -> all True)."""
    if max_diff is None:
        return jnp.ones((l1.shape[0], l2.shape[0]), dtype=bool)
    return jnp.abs(l1[:, None] - l2[None, :]) <= max_diff


def rotation_histogram_filter(angles1, angles2, match_idx, match_ok, n_bins: int = 30, keep_bins: int = 3):
    """Rotation-consistency check (reference HISTO_LENGTH=30 + ComputeThreeMaxima
    pattern in the ORB-SLAM-derived matchers, src/tracking.cc:21-23).

    Keeps only matches whose angle difference falls into the `keep_bins` most
    populated histogram bins. Returns updated match_ok.
    """
    da = angles1 - angles2[match_idx]
    two_pi = 2.0 * jnp.pi
    da = jnp.mod(da, two_pi)
    bin_idx = jnp.floor(da / (two_pi / n_bins)).astype(jnp.int32) % n_bins
    counts = jnp.zeros(n_bins, dtype=jnp.int32).at[bin_idx].add(match_ok.astype(jnp.int32))
    _, top_bins = jax.lax.top_k(counts, keep_bins)
    in_top = (bin_idx[:, None] == top_bins[None, :]).any(axis=-1)
    return match_ok & in_top


def mutual_best_match(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    valid1: jnp.ndarray,
    valid2: jnp.ndarray,
    pair_mask: jnp.ndarray | None = None,
    max_dist: int = 50,
    ratio: float | None = None,
    d1_alt: jnp.ndarray | None = None,
):
    """One-shot matcher: best2 along rows + uniqueness along columns.

    Returns (idx2 [N1] int32, ok [N1] bool): idx2[i] is the match of d1[i].
    Column uniqueness resolves collisions by keeping the row with smaller
    distance (the reference's "already matched" checks, e.g.
    src/tracking.cc:1180-1230, serialized this; argmin over columns is the
    parallel equivalent).

    d1_alt supplies a second descriptor per row, matched as min(d, d_alt) —
    the batched form of the reference's nearest / 2nd-nearest observation
    descriptor retry (SearchFrom3D uses the nearest-KF descriptor,
    src/tracking.cc:1162; SearchFrom3DAdd retries with the 2nd nearest,
    :1275-1345).
    """
    mask = valid1[:, None] & valid2[None, :]
    if pair_mask is not None:
        mask = mask & pair_mask
    dist = hamming_matrix(d1, d2)
    if d1_alt is not None:
        dist = jnp.minimum(dist, hamming_matrix(d1_alt, d2))
    idx2, best_d, second_d = masked_best2(dist, mask)
    ok = best_d <= max_dist
    if ratio is not None:
        ok = ok & (best_d.astype(jnp.float32) < ratio * second_d.astype(jnp.float32))
    # column uniqueness: for each column, find the winning row
    n1, n2 = dist.shape
    rows = jnp.arange(n1)
    # distances each row claims at its chosen column; non-ok rows claim INF
    claim_d = jnp.where(ok, best_d, INF)
    col_best = jnp.full((n2,), INF, dtype=jnp.int32).at[idx2].min(claim_d)
    col_winner = jnp.full((n2,), -1, dtype=jnp.int32).at[idx2].max(
        jnp.where(claim_d == col_best[idx2], rows, -1)
    )
    ok = ok & (col_winner[idx2] == rows)
    return idx2, ok
