"""Planar text-object parameterization θ ∈ R³.

A text object is a 3D plane stored compactly in its host keyframe: for any
in-box pixel with unit-plane ray m = (m1, m2, 1), the inverse depth is
ρ = 1/z = −mᵀθ (reference: include/ModelTool.hpp:156, src/tool.cc:1596).
Equivalently the plane satisfies θᵀp + 1 = 0, i.e. (θ, 1) is the homogeneous
plane covector in host coordinates; θ = n/d is the scaled normal.

All functions broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import qrotate, qconj
from . import se3

EPS = 1e-12


def ray_from_pixel(uv: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Pixel [..., 2] -> unit-plane ray [..., 3] = ((u-cx)/fx, (v-cy)/fy, 1)."""
    m1 = (uv[..., 0] - cx) / fx
    m2 = (uv[..., 1] - cy) / fy
    return jnp.stack([m1, m2, jnp.ones_like(m1)], axis=-1)


def inv_depth(ray: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """ρ = −mᵀθ for rays [..., 3] against plane θ [..., 3]."""
    return -(ray * theta).sum(axis=-1)


def backproject(ray: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Host-frame 3D point of a ray on the plane: p_r = m / ρ."""
    rho = inv_depth(ray, theta)
    return ray / rho[..., None].clip(EPS)  # caller gates on rho > 0


def project_to_target(ray: jnp.ndarray, theta: jnp.ndarray, T_cr: jnp.ndarray) -> jnp.ndarray:
    """Plane projection host→target: p_c = R_cr·(m/ρ) + t_cr with ρ = −mᵀθ.

    The core of the 6 `GetProjText` overloads (src/tool.cc:1593-1741) and of
    the photometric functors' `TextProj` (include/ModelTool.hpp:164-171).
    """
    return se3.apply(T_cr, backproject(ray, theta))


def transform_theta(theta: jnp.ndarray, T_rw: jnp.ndarray) -> jnp.ndarray:
    """Re-express the plane in another frame (reference TransTheta,
    src/tool.cc:1501-1512).

    If θ is the plane in frame r and T_rw maps w-coords into r, then the
    homogeneous covector transforms as (θ_w, d_w) = T_rwᵀ (θ_r, 1); dividing
    by the 4th component returns the compact form θ_w.
    """
    q, t = se3.unpack(T_rw)
    n_w = qrotate(qconj(q), theta)  # R_rwᵀ θ
    d_w = (t * theta).sum(axis=-1) + 1.0
    return n_w / d_w[..., None]


def plane_normal_world(theta: jnp.ndarray, T_rw: jnp.ndarray) -> jnp.ndarray:
    """Unit world-frame normal of a plane hosted in frame r (T_rw = host pose Tcw)."""
    th_w = transform_theta(theta, T_rw)
    return th_w / jnp.linalg.norm(th_w, axis=-1, keepdims=True).clip(EPS)


def view_cos(theta: jnp.ndarray, T_rw: jnp.ndarray, cam_center_w: jnp.ndarray, point_w: jnp.ndarray) -> jnp.ndarray:
    """cos between plane normal and viewing ray — the CheckOrientation gate
    (src/tool.cc:1393-1407, threshold 0.5)."""
    n = plane_normal_world(theta, T_rw)
    v = cam_center_w - point_w
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(EPS)
    return jnp.abs((n * v).sum(axis=-1))


def solve_theta_3pt(rays: jnp.ndarray, rhos: jnp.ndarray) -> jnp.ndarray:
    """Closed-form θ from 3 (ray, ρ) constraints: solve −[m1;m2;m3] θ = ρ.

    The reference solves this 3x3 system inside `CalculateTextTheta`
    (src/initializer.cc:1004-1061; note its final sign flip `theta = -theta`
    is an artifact of building the system as +mᵀθ=ρ then negating — here we
    solve the signed system directly). Batched over leading dims for RANSAC.

    rays: [..., 3, 3], rhos: [..., 3] -> theta [..., 3]
    """
    A = -rays
    return jnp.linalg.solve(A, rhos[..., None])[..., 0]


def fit_theta_lstsq(rays: jnp.ndarray, rhos: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted least-squares θ from N (ray, ρ) pairs, −raysᵀθ = ρ.

    rays [..., N, 3], rhos [..., N], w [..., N] -> [..., 3].
    Normal equations (3x3) — tiny, batched, TPU-friendly.
    """
    A = -rays
    AtA = jnp.einsum("...ni,...n,...nj->...ij", A, w, A) + 1e-9 * jnp.eye(3)
    Atb = jnp.einsum("...ni,...n,...n->...i", A, w, rhos)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
