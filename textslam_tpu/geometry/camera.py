"""Pinhole camera projection helpers (batched, jit-friendly).

The reference undistorts whole images up front (cv::undistort, main.cpp:73),
so the working camera model everywhere downstream is a pure pinhole; we keep
the same split (undistortion lives in io/dataset.py on the host).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def project(p_cam: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Camera-frame points [..., 3] -> pixels [..., 2]. No cheirality gating
    here; callers mask on z > 0 separately."""
    z = p_cam[..., 2:3]
    zc = jnp.where(jnp.abs(z) < EPS, jnp.sign(z) * EPS + (z == 0) * EPS, z)
    u = fx * p_cam[..., 0:1] / zc + cx
    v = fy * p_cam[..., 1:2] / zc + cy
    return jnp.concatenate([u, v], axis=-1)


def unproject(uv: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Pixels [..., 2] -> unit-plane rays [..., 3]."""
    m1 = (uv[..., 0] - cx) / fx
    m2 = (uv[..., 1] - cy) / fy
    return jnp.stack([m1, m2, jnp.ones_like(m1)], axis=-1)


def in_image(uv: jnp.ndarray, width: int, height: int, margin: float = 0.0) -> jnp.ndarray:
    """Validity mask [...] for pixels inside the image (optionally shrunk)."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= margin) & (u <= width - 1 - margin) & (v >= margin) & (v <= height - 1 - margin)
    )


def project_jacobian(p_cam: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """d(u,v)/d(p_cam): [..., 2, 3] analytic Jacobian of the pinhole map.

    Used by every reprojection/photometric residual family to build analytic
    Jacobians (replacing the reference's CENTRAL numeric diff,
    include/nume_BAText.h:98 — SURVEY.md §7.3.3)."""
    x, y = p_cam[..., 0], p_cam[..., 1]
    z = p_cam[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < EPS, EPS, z)
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    J = jnp.stack(
        [fx * iz, zero, -fx * x * iz2, zero, fy * iz, -fy * y * iz2],
        axis=-1,
    )
    return J.reshape(p_cam.shape[:-1] + (2, 3))
