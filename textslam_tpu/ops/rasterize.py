"""Quad rasterization kernels: point-in-quad masks, masked box statistics,
label images for text↔detection association.

The reference rasterizes text quads with cv::fillPoly to get (mu, sigma)
statistics (CalTextinfo, src/tool.cc:1178-1240), in-box pixel lists
(GetBoxAllPixs, :1264-1338) and float label images for data association
(GetTextLabelMask, :2140; lookup at src/tracking.cc:2116-2127). On TPU a quad
mask is four half-plane tests evaluated densely on the VPU — no polygon fill.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quad_mask(quad: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Dense [H, W] bool mask of pixels inside a (convex, CCW or CW) quad.

    quad: [..., 4, 2] (u, v) corners. Broadcasts over leading dims.
    A point is inside iff all four edge cross-products share a sign."""
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    p = jnp.stack([u, v], axis=-1)  # [H, W, 2]
    a = quad  # [..., 4, 2]
    b = jnp.roll(quad, -1, axis=-2)
    e = b - a  # edge vectors
    # cross of edge x (p - a) for each edge: [..., 4, H, W]
    rel_u = p[..., 0] - a[..., :, None, None, 0]
    rel_v = p[..., 1] - a[..., :, None, None, 1]
    cross = e[..., :, None, None, 0] * rel_v - e[..., :, None, None, 1] * rel_u
    inside = (cross >= 0).all(axis=-3) | (cross <= 0).all(axis=-3)
    return inside


def point_in_quad(points: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """points [..., 2] vs quad [4, 2] (or broadcastable) -> bool [...]."""
    a = quad
    b = jnp.roll(quad, -1, axis=-2)
    e = b - a
    rel = points[..., None, :] - a  # [..., 4, 2]
    cross = e[..., 0] * rel[..., 1] - e[..., 1] * rel[..., 0]
    return (cross >= 0).all(axis=-1) | (cross <= 0).all(axis=-1)


def quad_stats(img: jnp.ndarray, quad: jnp.ndarray, valid_shape=None):
    """(mu, sigma, n) of image intensities inside the quad.

    img [H, W], quad [4, 2] in the same pixel scale. Matches the reference's
    per-level box statistics recomputed at problem build
    (src/optimizer.cc:1179-1184). sigma floors at 1e-3 to keep the
    normalized-intensity residual finite on degenerate boxes."""
    H, W = img.shape
    mask = quad_mask(quad, H, W)
    if valid_shape is not None:
        u = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        v = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        mask = mask & (u < valid_shape[1]) & (v < valid_shape[0])
    n = mask.sum()
    nf = jnp.maximum(n, 1).astype(img.dtype)
    mu = jnp.where(mask, img, 0.0).sum() / nf
    var = jnp.where(mask, (img - mu) ** 2, 0.0).sum() / nf
    return mu, jnp.sqrt(var).clip(1e-3), n


def label_lookup(quads: jnp.ndarray, quads_valid: jnp.ndarray, points: jnp.ndarray):
    """Data association by label image, without the image: for each point,
    the index of the (valid) quad containing it, or -1.

    quads [T, 4, 2], quads_valid [T], points [D, 2] -> [D] int32.
    When multiple quads contain a point the lowest index wins (the reference's
    label image is painted in object order, so later objects overwrite —
    difference is immaterial because overlapping text boxes are rejected
    upstream)."""
    inside = jax.vmap(lambda q: point_in_quad(points, q))(quads)  # [T, D]
    inside = inside & quads_valid[:, None]
    T = quads.shape[0]
    idx = jnp.where(inside, jnp.arange(T)[:, None], T)
    best = idx.min(axis=0)
    return jnp.where(best < T, best, -1).astype(jnp.int32)
