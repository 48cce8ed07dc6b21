"""Hand-written Pallas TPU kernels for ops where XLA's default lowering
leaves throughput on the table (SURVEY.md §7.2 M7: FAST, irregular gathers,
Hamming matcher, Levenshtein are the expected candidates).

Kernels:
- `hamming_matrix_pallas`: tiled [N1, N2] popcount-reduction — the inner loop
  of every matcher call (SearchFrom3D, two-view init, triangulation search,
  loop-closing correspondence).
- `patch_sample_grouped`: photometric patch sampling for text residuals.
  XLA lowers the per-feature 8x8 patch gather (vmap of dynamic_slice) to a
  generic gather running at ~3 GB/s effective — 55% of every BA iteration.
  Text observations arrive grouped by (object, target-KF) pair and all of a
  pair's samples live inside one projected text box, so this kernel DMAs ONE
  contiguous image region per pair into VMEM and evaluates all its bilinear
  samples as two separable one-hot contractions on the MXU (row combine =
  matmul, column combine = VPU reduce). No scattered gathers anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at lowering time; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

TILE = 128


def _hamming_kernel(d1_ref, d2_ref, out_ref):
    """One [TILE, TILE] output block: popcount(xor) accumulated word by word.

    Descriptors arrive transposed as [8, TILE] uint32 so the 128-wide lane
    dimension is the descriptor index (native (8, 128) uint32 tiling); the
    word loop keeps the working set at one [TILE, TILE] register tile instead
    of a [TILE, TILE, 8] VMEM intermediate."""
    acc = jnp.zeros((TILE, TILE), jnp.int32)
    for w in range(d1_ref.shape[0]):
        x = jnp.bitwise_xor(d1_ref[w, :][:, None], d2_ref[w, :][None, :])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=())
def hamming_matrix_pallas(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances [N1, N2] via a tiled Pallas kernel.

    Pads both sets to TILE multiples (masked rows yield garbage distances in
    the padded region — callers already mask by validity)."""
    N1, W = d1.shape
    N2 = d2.shape[0]
    P1 = (N1 + TILE - 1) // TILE * TILE
    P2 = (N2 + TILE - 1) // TILE * TILE
    d1t = jnp.pad(d1, ((0, P1 - N1), (0, 0))).T  # [W, P1]
    d2t = jnp.pad(d2, ((0, P2 - N2), (0, 0))).T  # [W, P2]
    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((P1, P2), jnp.int32),
        grid=(P1 // TILE, P2 // TILE),
        in_specs=[
            pl.BlockSpec((W, TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(d1t, d2t)
    return out[:N1, :N2]


# ---------------------------------------------------------------------------
# Grouped photometric patch sampling (text residual hot path)
# ---------------------------------------------------------------------------

# pairs of (text object, target KF) processed per grid step. Measured on
# v5e: PP=2 buys nothing over PP=1 (2.54 vs 2.47 ms for 320 pairs) — the
# kernel is VPU/DMA-bound per pair, not grid-overhead-bound.
PAIRS_PER_STEP = 1


def _patch_sample_kernel(RH: int, RW: int, C: int, PP: int,
                         precision=None):
    """Kernel factory (RH/RW/C are compile-time block constants).

    The image stack arrives CHANNEL-PLANAR [K, C, H, W] so each channel's
    region is a plain 2D [RH, RW] block (contiguous rows; Mosaic cannot
    shape-cast 3D vectors and charges heavily for channel-interleaved
    lanes). Per pair: C strided DMAs HBM->VMEM, one one-hot row-combine
    matmul on the MXU per channel, and a column combine on the VPU.

    Numeric note (`precision`): at DEFAULT (single-pass bf16) the row
    weights (1-d, d) round to 2^-9 and the region values to 2^-8 relative,
    so sampled intensities err by up to ~1 gray absolute. That sits below
    the photometric noise floor: A/B runs on rendered ground-truth
    sequences show no ATE difference vs HIGHEST, so the solver pins
    precision=None (single-pass bf16) — see solver/ba.py
    _sample_text_values, which is the governing accuracy claim. HIGHEST
    (6-pass, exact to f32) costs ~20% of BA throughput and remains
    available to flip the experiment; even then the kernel beats the XLA
    per-feature gather it replaces because DMA, weight construction, and
    the column reduce dominate over the extra MXU passes. Mosaic does not
    support the 3-pass HIGH mode."""

    def kernel(meta_ref, uv_ref, imgs_ref, out_ref, region, sem):
        s = pl.program_id(0)
        n = pl.num_programs(0)

        def copy(i, slot, c):
            k = meta_ref[3 * i]
            # origins are tile-aligned by construction (grouped_bilinear_stack)
            oy = pl.multiple_of(meta_ref[3 * i + 1], 8)
            ox = pl.multiple_of(meta_ref[3 * i + 2], 128)
            return pltpu.make_async_copy(
                imgs_ref.at[k, c, pl.ds(oy, RH), pl.ds(ox, RW)],
                region.at[slot, c],
                sem.at[slot, c],
            )

        # double-buffered region pipeline over PP pairs per grid step: while
        # step s samples its PP regions, the DMAs for step s+1 land in the
        # other buffer half (dynamic scratch indices, no branches)
        base = PP * jax.lax.rem(s, 2)
        nbase = PP * jax.lax.rem(s + 1, 2)

        @pl.when(s == 0)
        def _():
            for j in range(PP):
                for c in range(C):
                    copy(j, j, c).start()

        for j in range(PP):
            for c in range(C):
                copy(PP * s + j, base + j, c).wait()

        @pl.when(s + 1 < n)
        def _():
            for j in range(PP):
                for c in range(C):
                    copy(PP * (s + 1) + j, nbase + j, c).start()

        Q = uv_ref.shape[2]
        rowsH = jax.lax.broadcasted_iota(jnp.int32, (Q, RH), 1)
        colsW = jax.lax.broadcasted_iota(jnp.int32, (Q, RW), 1)
        for j in range(PP):
            g = PP * s + j
            ox = meta_ref[3 * g + 2].astype(jnp.float32)
            oy = meta_ref[3 * g + 1].astype(jnp.float32)
            u = (uv_ref[j, 0, :] - ox).clip(0.0, RW - 1)
            v = (uv_ref[j, 1, :] - oy).clip(0.0, RH - 1)
            u0 = jnp.floor(u).astype(jnp.int32).clip(0, RW - 2)
            v0 = jnp.floor(v).astype(jnp.int32).clip(0, RH - 2)
            du = u - u0.astype(jnp.float32)
            dv = v - v0.astype(jnp.float32)
            wy = (
                (rowsH == v0[:, None]).astype(jnp.float32) * (1.0 - dv[:, None])
                + (rowsH == v0[:, None] + 1).astype(jnp.float32) * dv[:, None]
            )
            wx = (
                (colsW == u0[:, None]).astype(jnp.float32) * (1.0 - du[:, None])
                + (colsW == u0[:, None] + 1).astype(jnp.float32) * du[:, None]
            )
            for c in range(C):
                reg = region[base + j, c]
                if precision is None:
                    # true single-pass bf16 regardless of the ambient
                    # default_matmul_precision config (an explicit
                    # Precision.DEFAULT would still defer to the config, and
                    # Mosaic rejects explicit bf16 operands): reset the
                    # config locally at trace time
                    with jax.default_matmul_precision("default"):
                        tmp = jax.lax.dot_general(
                            wy, reg,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [Q, RW]
                else:
                    tmp = jax.lax.dot_general(
                        wy, reg,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                out_ref[j, c, :] = (tmp * wx).sum(axis=1)

    return kernel


def patch_sample_grouped(imgs_planar: jnp.ndarray, meta: jnp.ndarray,
                         uv_t: jnp.ndarray, RH: int, RW: int,
                         precision=None) -> jnp.ndarray:
    """Bilinear-sample grouped clusters of points from an image stack.

    imgs_planar [K, C, H, W] float32 (HBM); meta [G, 3] int32 rows (image
    index k, region origin oy, ox) with 0 <= oy <= H-RH, 0 <= ox <= W-RW;
    uv_t [G, 2, Q] float32 ABSOLUTE pixel coords of group g's samples (all
    inside its region — out-of-region samples clamp to the region edge and
    must be masked by the caller). Returns vals [G, C, Q].
    """
    G = meta.shape[0]
    Q = uv_t.shape[2]
    C = imgs_planar.shape[1]
    PP = PAIRS_PER_STEP
    Gp = -(-G // PP) * PP
    if Gp != G:
        # padded groups read image 0 at origin 0 (valid, discarded by caller)
        meta = jnp.concatenate(
            [meta, jnp.zeros((Gp - G, 3), meta.dtype)], axis=0)
        uv_t = jnp.concatenate(
            [uv_t, jnp.zeros((Gp - G,) + uv_t.shape[1:], uv_t.dtype)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Gp // PP,),
        in_specs=[
            pl.BlockSpec((PP, 2, Q), lambda s, meta: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((PP, C, Q), lambda s, meta: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * PP, C, RH, RW), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * PP, C)),
        ],
    )
    out = pl.pallas_call(
        _patch_sample_kernel(RH, RW, C, PP, precision),
        out_shape=jax.ShapeDtypeStruct((Gp, C, Q), jnp.float32),
        grid_spec=grid_spec,
    )(meta.reshape(-1), uv_t, imgs_planar)
    return out[:G]


def grouped_bilinear_stack(imgs: jnp.ndarray, group_k: jnp.ndarray,
                           uv: jnp.ndarray, region_h: int = 160,
                           region_w: int = 384, precision=None):
    """Drop-in grouped replacement for per-feature patch gathers.

    imgs [K, H, W, C]; group_k [G] image index per group; uv [G, Q, 2]
    sample positions (level px). Each group's samples must cluster inside a
    region_h x region_w window (one projected text box) — samples outside
    the window or the image return 0 with mask False, matching the padded /
    broken-row semantics of ops.interp.

    Mosaic only DMAs tile-aligned slices of tiled HBM memrefs, so region
    origins snap DOWN to (8-row, 128-px) boundaries; the window is sized so
    an aligned origin still covers a box of (region_h - 8) x
    (region_w - 128) px. Levels whose image is smaller than the window use
    the full image extent (origin 0 — trivially aligned).

    Returns (vals [G, Q, C], mask [G, Q]).
    """
    K, H, W, C = imgs.shape
    G, Q, _ = uv.shape
    ALIGN_X = 128
    # every DMA extent must also be tile-aligned: pad the stack itself to
    # (8-row, 128-lane) multiples (zeros — only ever read by samples that
    # the in-image mask already kills)
    H8 = -(-H // 8) * 8
    W128 = -(-W // ALIGN_X) * ALIGN_X
    full_h = H8 <= region_h
    full_w = W128 <= region_w
    RH = H8 if full_h else region_h
    RW = W128 if full_w else region_w

    uv = jnp.nan_to_num(uv, nan=-1e6, posinf=1e6, neginf=-1e6)
    u = uv[..., 0]
    v = uv[..., 1]
    in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    big = jnp.float32(1e9)
    if full_w:
        ox = jnp.zeros((G,), jnp.int32)
    else:
        min_u = jnp.where(in_img, u, big).min(axis=1)
        ox = (jnp.floor(jnp.where(min_u < big, min_u, 0.0)).astype(jnp.int32)
              // ALIGN_X * ALIGN_X)
        ox = ox.clip(0, W128 - RW)
    if full_h:
        oy = jnp.zeros((G,), jnp.int32)
    else:
        min_v = jnp.where(in_img, v, big).min(axis=1)
        oy = jnp.floor(jnp.where(min_v < big, min_v, 0.0)).astype(jnp.int32) // 8 * 8
        oy = oy.clip(0, H8 - RH)
    in_region = (
        (u >= ox[:, None]) & (u <= ox[:, None] + (RW - 1))
        & (v >= oy[:, None]) & (v <= oy[:, None] + (RH - 1))
    )
    mask = in_img & in_region
    meta = jnp.stack([group_k.astype(jnp.int32), oy, ox], axis=-1)
    # channel-planar for 2D per-channel regions; on the constant image
    # stack inside an LM scan XLA hoists this transpose out of the loop
    imgs_p = imgs.transpose(0, 3, 1, 2)
    if H8 != H or W128 != W:
        imgs_p = jnp.pad(imgs_p, ((0, 0), (0, 0), (0, H8 - H), (0, W128 - W)))
    vals = patch_sample_grouped(
        imgs_p, meta, uv.transpose(0, 2, 1), RH, RW, precision
    )  # [G, C, Q]
    vals = vals.transpose(0, 2, 1)
    return jnp.where(mask[..., None], vals, 0.0), mask
