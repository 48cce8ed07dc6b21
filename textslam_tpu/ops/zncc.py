"""Zero-mean normalized cross-correlation gate for text observations.

Reference: CheckZNCC + CalZNCC (src/tool.cc:1411-1498) — a text object is
only observed in a frame if the ZNCC between its reference in-box pixels and
the intensities sampled at their projections exceeds 0.1
(TextJudge, src/tracking.cc:1966-1988).
"""

from __future__ import annotations

import jax.numpy as jnp

from .interp import bilinear


def zncc(a: jnp.ndarray, b: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked ZNCC over the last axis. a, b, valid: [..., N] -> [...]."""
    n = valid.sum(-1).clip(1)
    am = (a * valid).sum(-1) / n
    bm = (b * valid).sum(-1) / n
    az = (a - am[..., None]) * valid
    bz = (b - bm[..., None]) * valid
    num = (az * bz).sum(-1)
    den = jnp.sqrt((az * az).sum(-1) * (bz * bz).sum(-1)).clip(1e-9)
    return num / den


def zncc_gate(ref_inten: jnp.ndarray, ref_valid: jnp.ndarray, img: jnp.ndarray, uv: jnp.ndarray):
    """ZNCC between stored reference intensities and current samples at uv.

    ref_inten [..., N], ref_valid [..., N], uv [..., N, 2] in img pixels.
    Returns (score [...], n_valid [...])."""
    cur, ok = bilinear(img, uv)
    v = ref_valid & ok
    return zncc(ref_inten, cur, v), v.sum(-1)
