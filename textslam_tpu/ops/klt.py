"""Batched pyramidal Lucas-Kanade optical flow.

The reference seeds new-text feature tracks with cv::calcOpticalFlowPyrLK
(TrackNewTextFeat, src/tracking.cc:1752-1785) to triangulate theta for boxes
not yet mapped. Here LK is one vmapped kernel: per level (coarse to fine) a
fixed-size patch gather, a 2x2 normal-equation solve, and a lax.fori_loop of
Gauss-Newton updates — every feature in parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_R = 5  # 11x11 window (cv default 21x21 at full res; smaller per level)


def _patch_offsets(r: int = PATCH_R):
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    return jnp.asarray(np.stack([dx, dy], -1).reshape(-1, 2).astype(np.float32))  # [P2, 2]


def _sample(img, uv):
    """Bilinear sample [P2] values at uv [P2, 2] (no masking: caller clamps)."""
    from .interp import bilinear

    vals, ok = bilinear(img, uv)
    return vals, ok


@functools.partial(jax.jit, static_argnames=("n_iters",))
def lk_level(img_I, grad_I, img_J, uv_I, uv_J, valid, n_iters: int = 10):
    """One pyramid level of LK for all features.

    img_I/grad_I: template intensity [H, W] and gradients [H, W, 2];
    img_J: target intensity; uv_I [N, 2] feature positions in template;
    uv_J [N, 2] current estimates in target. Returns (uv_J', valid')."""
    offs = _patch_offsets()

    def one(p_i, p_j, v):
        pos_i = p_i[None, :] + offs
        Ivals, ok_i = _sample(img_I, pos_i)
        gx, _ = _sample(grad_I[..., 0], pos_i)
        gy, _ = _sample(grad_I[..., 1], pos_i)
        g = jnp.stack([gx, gy], -1) / 8.0  # sobel -> dI/dpx
        G = jnp.einsum("pi,pj->ij", g, g) + 1e-6 * jnp.eye(2)
        det_ok = jnp.linalg.det(G) > 1e-6

        def body(_, d):
            Jvals, ok_j = _sample(img_J, p_j[None, :] + d[None, :] + offs)
            e = (Ivals - Jvals) * ok_i * ok_j
            b = jnp.einsum("pi,p->i", g, e)
            return d + jnp.linalg.solve(G, b)

        d = jax.lax.fori_loop(0, n_iters, body, jnp.zeros(2))
        new_p = p_j + d
        # validity: in-image + final residual sanity
        Jv, okj = _sample(img_J, new_p[None, :] + offs)
        resid = jnp.abs(Ivals - Jv).mean()
        H, W = img_J.shape
        inb = (new_p[0] >= PATCH_R) & (new_p[0] < W - PATCH_R) & (new_p[1] >= PATCH_R) & (new_p[1] < H - PATCH_R)
        return new_p, v & det_ok & inb & (resid < 32.0) & okj.all()

    return jax.vmap(one)(uv_I, uv_J, valid)


def klt_track(pyr_I, grads_I, pyr_J, uv: jnp.ndarray, valid: jnp.ndarray, levels=(3, 2, 1, 0), n_iters: int = 10):
    """Coarse-to-fine track of features uv (template pixel coords, level 0)
    from pyramid I to pyramid J (tuples of per-level arrays as returned by
    ops.pyramid.build_pyramid). Returns (uv_J [N, 2] level-0 coords, valid)."""
    guess = uv / (2.0 ** levels[0])
    v = valid
    for li, l in enumerate(levels):
        s = 2.0**l
        uv_l = uv / s
        uv_j, v_l = lk_level(pyr_I[l], grads_I[l], pyr_J[l], uv_l, guess, v, n_iters=n_iters)
        if l != levels[-1]:
            # coarse levels refine the guess but must not invalidate: the
            # patch rarely fits inside the smallest levels
            guess = uv_j * 2.0
        else:
            v = v & v_l
    return uv_j * (2.0 ** levels[-1]), v
