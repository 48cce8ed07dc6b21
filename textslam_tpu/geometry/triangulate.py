"""Batched two-view triangulation + cheirality checks.

Replaces the reference's per-point `Triangulate` (SVD of a 4x4 DLT system,
src/initializer.cc, and cv::triangulatePoints at src/tracking.cc:811) with a
single batched SVD over all correspondences.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3
from .quaternion import qto_matrix

EPS = 1e-12


def _proj_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Packed pose [..., 7] -> normalized projection matrix [R|t] [..., 3, 4]."""
    q, t = se3.unpack(T)
    R = qto_matrix(q)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def triangulate(ray1: jnp.ndarray, ray2: jnp.ndarray, T1: jnp.ndarray, T2: jnp.ndarray) -> jnp.ndarray:
    """DLT triangulation in world coords.

    ray1/ray2: unit-plane rays [..., 3] in cams 1/2; T1/T2 world->cam poses
    [..., 7] (broadcastable). Returns world points [..., 3].
    """
    P1 = _proj_matrix(T1)
    P2 = _proj_matrix(T2)
    x1, y1 = ray1[..., 0], ray1[..., 1]
    x2, y2 = ray2[..., 0], ray2[..., 1]
    A = jnp.stack(
        [
            x1[..., None] * P1[..., 2, :] - P1[..., 0, :],
            y1[..., None] * P1[..., 2, :] - P1[..., 1, :],
            x2[..., None] * P2[..., 2, :] - P2[..., 0, :],
            y2[..., None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # [..., 4, 4]
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[..., 3, :]
    w = X[..., 3:4]
    return X[..., 0:3] / jnp.where(jnp.abs(w) < EPS, EPS, w)


def depths(p_world: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """z-coordinate of world points in camera frame of T (world->cam)."""
    return se3.apply(T, p_world)[..., 2]


def reproj_err2(p_world: jnp.ndarray, T: jnp.ndarray, uv: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Squared pixel reprojection error of world points into camera T."""
    from .camera import project

    pred = project(se3.apply(T, p_world), fx, fy, cx, cy)
    d = pred - uv
    return (d * d).sum(axis=-1)


def parallax_cos(p_world: jnp.ndarray, C1: jnp.ndarray, C2: jnp.ndarray) -> jnp.ndarray:
    """cos of the parallax angle between the two viewing rays (CheckRT gate)."""
    v1 = p_world - C1
    v2 = p_world - C2
    n1 = jnp.linalg.norm(v1, axis=-1).clip(EPS)
    n2 = jnp.linalg.norm(v2, axis=-1).clip(EPS)
    return (v1 * v2).sum(axis=-1) / (n1 * n2)
