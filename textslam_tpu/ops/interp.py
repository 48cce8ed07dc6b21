"""Bilinear sampling — the single most reused primitive of the system.

Every photometric residual evaluates bilinear intensity + gradient samples at
projected subpixel positions (reference: GetIntenBilinterPtr src/tool.cc:1150
and include/ModelTool.hpp:233-329). Here it is one batched gather that XLA
vectorizes; values outside the image return 0 with a False validity mask so
padded residual slots die cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear(img: jnp.ndarray, uv: jnp.ndarray, valid_shape=None):
    """Sample img [H, W] or [H, W, C] at uv [..., 2] (u=x=col, v=y=row).

    Returns (values [..., (C)], mask [...]); mask False outside
    [0, W-1]x[0, H-1] (or outside `valid_shape=(h, w)` for packed padded
    levels), and such samples are exactly 0.
    """
    H, W = img.shape[0], img.shape[1]
    h = H if valid_shape is None else valid_shape[0]
    w = W if valid_shape is None else valid_shape[1]
    u = uv[..., 0]
    v = uv[..., 1]
    mask = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    u = u.clip(0.0, w - 1)
    v = v.clip(0.0, h - 1)
    u0 = jnp.floor(u).astype(jnp.int32).clip(0, W - 2)
    v0 = jnp.floor(v).astype(jnp.int32).clip(0, H - 2)
    du = (u - u0)[..., None] if img.ndim == 3 else (u - u0)
    dv = (v - v0)[..., None] if img.ndim == 3 else (v - v0)
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    top = i00 + du * (i01 - i00)
    bot = i10 + du * (i11 - i10)
    out = top + dv * (bot - top)
    m = mask[..., None] if img.ndim == 3 else mask
    return jnp.where(m, out, 0.0), mask


def bilinear_packed(pyr_data: jnp.ndarray, pyr_shapes: jnp.ndarray, level, uv: jnp.ndarray):
    """Sample a packed pyramid (see ops.pyramid.pack_pyramid) at a given level.

    pyr_data [L, Hmax, Wmax, 3], level scalar int, uv [..., 2] in level-l
    pixel coords. Returns (intensity, gx, gy, mask)."""
    img = pyr_data[level]
    h = pyr_shapes[level, 0]
    w = pyr_shapes[level, 1]
    vals, mask = bilinear(img, uv, valid_shape=(h, w))
    return vals[..., 0], vals[..., 1], vals[..., 2], mask


def bilinear_stack(imgs: jnp.ndarray, k, uv: jnp.ndarray):
    """Bilinear-sample image k of a stack imgs [K, H, W] or [K, H, W, C] at
    uv [..., 2] (channels sampled together).

    The stack index joins the gather (pointwise) instead of materializing
    imgs[k] — vmapping imgs[k] per observation would copy a full image per
    row (catastrophic on TPU HBM)."""
    H, W = imgs.shape[1], imgs.shape[2]
    mc = imgs.ndim == 4
    u = uv[..., 0]
    v = uv[..., 1]
    mask = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    u = u.clip(0.0, W - 1)
    v = v.clip(0.0, H - 1)
    u0 = jnp.floor(u).astype(jnp.int32).clip(0, W - 2)
    v0 = jnp.floor(v).astype(jnp.int32).clip(0, H - 2)
    du = (u - u0)[..., None] if mc else (u - u0)
    dv = (v - v0)[..., None] if mc else (v - v0)
    i00 = imgs[k, v0, u0]
    i01 = imgs[k, v0, u0 + 1]
    i10 = imgs[k, v0 + 1, u0]
    i11 = imgs[k, v0 + 1, u0 + 1]
    top = i00 + du * (i01 - i00)
    bot = i10 + du * (i11 - i10)
    out = top + dv * (bot - top)
    m = mask[..., None] if mc else mask
    return jnp.where(m, out, 0.0), mask


def patch_bilinear_stack(imgs: jnp.ndarray, k: jnp.ndarray, center_uv: jnp.ndarray, uv: jnp.ndarray):
    """Bilinear sampling of clustered points via per-feature patch gathers.

    imgs [K, H, W, C]; k [F] image indices; center_uv [F, 2] cluster centers;
    uv [F, S, 2] sample positions (all within ~±2.5px of the center — the
    INTERVAL8 pattern). One 8x8xC patch gather per feature (contiguous rows,
    TPU-friendly) + an in-patch one-hot bilinear einsum on the MXU replaces
    S*4 scattered corner gathers per feature.

    Returns (vals [F, S, C], mask [F, S]). Samples falling outside the patch
    or the image are masked to 0.
    """
    import jax

    K, H, W, C = imgs.shape
    F, S, _ = uv.shape
    PS = 8  # patch size; pattern spans ±2 around center, bilinear +1, margin

    # patch origin: center-3 clamped so the patch stays inside the image
    ox = (jnp.floor(center_uv[:, 0]) - 3).astype(jnp.int32).clip(0, W - PS)
    oy = (jnp.floor(center_uv[:, 1]) - 3).astype(jnp.int32).clip(0, H - PS)

    def slice_one(ki, yi, xi):
        return jax.lax.dynamic_slice(imgs, (ki, yi, xi, 0), (1, PS, PS, C))[0]

    patches = jax.vmap(slice_one)(k, oy, ox)  # [F, PS, PS, C]

    # in-image validity of each sample (image bounds, not patch bounds)
    u = uv[..., 0]
    v = uv[..., 1]
    in_img = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    # patch-relative coordinates
    pu = u - ox[:, None].astype(u.dtype)
    pv = v - oy[:, None].astype(v.dtype)
    in_patch = (pu >= 0) & (pu <= PS - 1) & (pv >= 0) & (pv <= PS - 1)
    mask = in_img & in_patch
    pu = pu.clip(0.0, PS - 1)
    pv = pv.clip(0.0, PS - 1)
    u0 = jnp.floor(pu).astype(jnp.int32).clip(0, PS - 2)
    v0 = jnp.floor(pv).astype(jnp.int32).clip(0, PS - 2)
    du = pu - u0
    dv = pv - v0

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, PS), 2)
    au = (cols == u0[..., None]) * (1.0 - du[..., None]) + (cols == u0[..., None] + 1) * du[..., None]
    av = (cols == v0[..., None]) * (1.0 - dv[..., None]) + (cols == v0[..., None] + 1) * dv[..., None]
    wgt = av[..., :, None] * au[..., None, :]  # [F, S, PS, PS]
    vals = jnp.einsum(
        "fsq,fqc->fsc", wgt.reshape(F, S, PS * PS), patches.reshape(F, PS * PS, C)
    )
    return jnp.where(mask[..., None], vals, 0.0), mask
