"""Quaternion algebra (w, x, y, z convention, matching Ceres/reference poses).

The reference stores poses as double[7] = quaternion(w,x,y,z) + translation and
optimizes on the quaternion manifold (src/optimizer.cc:979-980,
include/rotation.h). Here quaternions are `[..., 4]` arrays; every op is
broadcast-native so it vmaps/shards for free.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def qidentity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(EPS)


def qmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def qrotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by quaternions q [..., 4] (R(q) @ v)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    # v' = v + 2 qw (qv x v) + 2 qv x (qv x v)
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def qto_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [..., 3, 3] rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def qfrom_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] quaternion (w >= 0). Branchless Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick numerically best via where-chains
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    return qnormalize(jnp.stack([qw, qx, qy, qz], axis=-1))


def qexp(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) tangent [..., 3] -> unit quaternion. exp(omega/2) convention:
    qexp(omega) rotates by angle |omega| about omega/|omega|.

    Gradient-safe at omega = 0 (the point every manifold Jacobian is taken
    at): the norm is computed through a `where`-guarded square so jacfwd
    never differentiates sqrt at 0."""
    sq = (omega * omega).sum(axis=-1, keepdims=True)
    small = sq < 1e-12
    sq_safe = jnp.where(small, 1.0, sq)
    theta = jnp.sqrt(sq_safe)
    half = 0.5 * theta
    # series: sin(t/2)/t = 1/2 - t^2/48 + ...; cos(t/2) = 1 - t^2/8 + ...
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * omega], axis=-1)


def qlog(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> so(3) tangent [..., 3] (inverse of qexp)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # take w>=0 branch
    w = q[..., 0:1].clip(-1.0, 1.0)
    v = q[..., 1:4]
    sq = (v * v).sum(axis=-1, keepdims=True)
    small = sq < 1e-12
    vn = jnp.sqrt(jnp.where(small, 1.0, sq))
    theta = 2.0 * jnp.arctan2(vn, w)
    k = jnp.where(small, 2.0 / w.clip(EPS), theta / vn)
    return k * v


def qretract(q: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Manifold retraction: apply tangent update delta [..., 3] on the left
    (world-frame perturbation), matching Ceres QuaternionParameterization."""
    return qnormalize(qmul(qexp(delta), q))
