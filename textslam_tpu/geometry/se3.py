"""SE(3) poses as (quaternion[...,4], translation[...,3]) pairs.

Convention matches the reference: `Tcw` maps world points into the camera
frame, p_c = R(q) p_w + t (src/frame.cc:526-539). Poses are kept as a 7-vector
[qw qx qy qz tx ty tz] in the SoA map state; these helpers operate on the
split (q, t) form and on packed [..., 7] arrays.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .quaternion import qconj, qmul, qnormalize, qrotate, qexp

Pose = Tuple[jnp.ndarray, jnp.ndarray]  # (q [...,4], t [...,3])


def identity(shape=()) -> jnp.ndarray:
    p = jnp.zeros(shape + (7,))
    return p.at[..., 0].set(1.0)


def pack(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q, t], axis=-1)


def unpack(T: jnp.ndarray) -> Pose:
    return T[..., 0:4], T[..., 4:7]


def apply(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Transform points p [..., 3] by packed pose T [..., 7]."""
    q, t = unpack(T)
    return qrotate(q, p) + t


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """T = A ∘ B (apply B first): R = Ra Rb, t = Ra tb + ta."""
    qa, ta = unpack(A)
    qb, tb = unpack(B)
    return pack(qnormalize(qmul(qa, qb)), qrotate(qa, tb) + ta)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    q, t = unpack(T)
    qi = qconj(q)
    return pack(qi, -qrotate(qi, t))


def relative(T_aw: jnp.ndarray, T_bw: jnp.ndarray) -> jnp.ndarray:
    """T_ab = T_aw ∘ T_bw^-1 — maps frame-b coords into frame a.

    This is the host→target chain the BA functors compose in-line
    (include/auto_BAScene.h:43-69: Tcr = Tcw · Trw⁻¹)."""
    return compose(T_aw, inverse(T_bw))


def retract(T: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Apply 6-dof tangent update delta [..., 6] = (omega, dt).

    Rotation updated on the manifold by left-multiplication (Ceres
    QuaternionParameterization semantics), translation additively — exactly the
    parameter-block structure of the reference solver (4-block quat + 3-block t,
    src/optimizer.cc:979-980)."""
    q, t = unpack(T)
    qn = qnormalize(qmul(qexp(delta[..., 0:3]), q))
    return pack(qn, t + delta[..., 3:6])
