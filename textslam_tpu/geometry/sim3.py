"""Sim(3) similarity transforms, packed as [..., 8] = [qw qx qy qz tx ty tz s].

Mirrors the reference's `Sim3_loop` struct (src/setting.h:129-171: q, t, s with
inverse/compose/map) and the Sim3 log map used by the pose-graph residual
(include/ModelTool.hpp:354-432). Also provides Horn's 1987 closed-form
alignment (src/Sim3Solver.cc:124-193) as a batched solve for RANSAC.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import qconj, qmul, qnormalize, qrotate, qexp, qlog

EPS = 1e-12


def identity(shape=()) -> jnp.ndarray:
    S = jnp.zeros(shape + (8,))
    return S.at[..., 0].set(1.0).at[..., 7].set(1.0)


def pack(q, t, s):
    return jnp.concatenate([q, t, s[..., None] if s.ndim == q.ndim - 1 else s], axis=-1)


def unpack(S):
    return S[..., 0:4], S[..., 4:7], S[..., 7]


def from_se3(T: jnp.ndarray, s=None) -> jnp.ndarray:
    sc = jnp.ones(T.shape[:-1]) if s is None else jnp.asarray(s)
    return jnp.concatenate([T, sc[..., None]], axis=-1)


def apply(S: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """p' = s R p + t."""
    q, t, s = unpack(S)
    return s[..., None] * qrotate(q, p) + t


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """S = A ∘ B: R = Ra Rb, s = sa sb, t = sa Ra tb + ta."""
    qa, ta, sa = unpack(A)
    qb, tb, sb = unpack(B)
    q = qnormalize(qmul(qa, qb))
    t = sa[..., None] * qrotate(qa, tb) + ta
    return jnp.concatenate([q, t, (sa * sb)[..., None]], axis=-1)


def inverse(S: jnp.ndarray) -> jnp.ndarray:
    q, t, s = unpack(S)
    qi = qconj(q)
    si = 1.0 / s.clip(EPS)
    ti = -si[..., None] * qrotate(qi, t)
    return jnp.concatenate([qi, ti, si[..., None]], axis=-1)


def _V_matrix(omega: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The W matrix of the Sim3 exp/log relating translation and tangent:
    t = W u.  Closed form per Strasdat's thesis (the reference implements the
    equivalent series at include/ModelTool.hpp:354-432).

    Gradient-safe at omega = 0 / sigma = 0 (guarded sqrt + where-branches):
    tangent Jacobians of exp/log are evaluated at zero in every Sim3 solver."""
    sq = (omega * omega).sum(axis=-1)
    small_theta = sq < 1e-12
    theta = jnp.sqrt(jnp.where(small_theta, 1.0, sq))
    s = jnp.exp(sigma)
    I = jnp.broadcast_to(jnp.eye(3), omega.shape[:-1] + (3, 3))
    wx = skew(omega)
    wx2 = wx @ wx
    t2 = jnp.where(small_theta, 1.0, sq)

    small_sigma = jnp.abs(sigma) < 1e-6

    # A = (s-1)/sigma  (sigma->0: 1)
    A = jnp.where(small_sigma, 1.0 + sigma / 2.0, (s - 1.0) / jnp.where(small_sigma, 1.0, sigma))

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    denom = (sigma * sigma + t2).clip(EPS)
    # B,C per Strasdat: W = A I + B wx + C wx^2
    b_gen = (s * sin_t * sigma + (1.0 - s * cos_t) * theta) / (theta.clip(EPS) * denom)
    c_gen = (
        A
        - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom
    ) / t2.clip(EPS)
    # theta -> 0 limits
    b_small = jnp.where(
        small_sigma, 0.5 + sigma / 6.0, (sigma * s - s + 1.0) / jnp.where(small_sigma, 1.0, sigma * sigma)
    )
    c_small = jnp.where(
        small_sigma,
        1.0 / 6.0 + sigma / 24.0,
        (s * (0.5 * sigma * sigma - sigma + 1.0) - 1.0) / jnp.where(small_sigma, 1.0, sigma**3),
    )
    B = jnp.where(small_theta, b_small, b_gen)
    C = jnp.where(small_theta, c_small, c_gen)
    return A[..., None, None] * I + B[..., None, None] * wx + C[..., None, None] * wx2


def skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def expm(tangent: jnp.ndarray) -> jnp.ndarray:
    """sim(3) tangent [..., 7] = (omega3, u3, sigma) -> Sim3 [..., 8]."""
    omega = tangent[..., 0:3]
    u = tangent[..., 3:6]
    sigma = tangent[..., 6]
    q = qexp(omega)
    W = _V_matrix(omega, sigma)
    t = jnp.einsum("...ij,...j->...i", W, u)
    s = jnp.exp(sigma)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def logm(S: jnp.ndarray) -> jnp.ndarray:
    """Sim3 [..., 8] -> tangent [..., 7] = (omega, u, sigma).

    Same residual layout as the pose-graph edge (include/numer_loop_ver2.h:47-55)."""
    q, t, s = unpack(S)
    omega = qlog(q)
    sigma = jnp.log(s.clip(EPS))
    W = _V_matrix(omega, sigma)
    u = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([omega, u, sigma[..., None]], axis=-1)


def horn_alignment(P1: jnp.ndarray, P2: jnp.ndarray, w=None, fix_scale: bool = False) -> jnp.ndarray:
    """Closed-form Sim3 S12 minimizing ||P1 - (s R P2 + t)|| (Horn 1987).

    Batched over leading dims; P1,P2 are [..., N, 3], w an optional [..., N]
    weight/validity mask. Rotation from the dominant eigenvector of the 4x4 N
    matrix, exactly the construction of src/Sim3Solver.cc:124-193 (but batched
    for TPU RANSAC: one einsum builds every hypothesis's covariance at once).
    """
    if w is None:
        w = jnp.ones(P1.shape[:-1])
    wsum = w.sum(axis=-1, keepdims=True).clip(EPS)
    c1 = (w[..., None] * P1).sum(axis=-2) / wsum
    c2 = (w[..., None] * P2).sum(axis=-2) / wsum
    X1 = (P1 - c1[..., None, :]) * w[..., None]
    X2 = P2 - c2[..., None, :]
    M = jnp.einsum("...ni,...nj->...ij", X2, X1)  # sum x2 x1^T (maps 2 -> 1)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx,
            Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz,
            Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy,
            Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz,
        ],
        axis=-1,
    ).reshape(M.shape[:-2] + (4, 4))
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[..., :, -1]  # largest eigenvalue -> rotation quaternion (w,x,y,z)
    q = qnormalize(jnp.where(q[..., 0:1] < 0, -q, q))
    RX2 = qrotate(q[..., None, :], X2)
    num = (w[..., None] * X1 * RX2).sum(axis=(-1, -2))
    den = (w[..., None] * RX2 * RX2).sum(axis=(-1, -2)).clip(EPS)
    s = jnp.where(jnp.asarray(fix_scale), jnp.ones_like(num), num / den)
    t = c1 - s[..., None] * qrotate(q, c2)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)
