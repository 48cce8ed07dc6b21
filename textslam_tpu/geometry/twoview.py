"""Two-view relative-pose bootstrap: batched H/F RANSAC + reconstruction.

Reference: src/initializer.cc — parallel homography & fundamental RANSAC over
200 8-point sets, model selection RH = SH/(SH+SF) > 0.40 (:102), then
ReconstructH (Faugeras) / ReconstructF (4-hypothesis cheirality vote).

TPU re-design: all 200 hypotheses are solved in ONE batched SVD and scored in
ONE [hyp, N] einsum pass — no sequential RANSAC loop. Reconstruction
hypotheses (4 for F via the essential matrix, 8 for H via Faugeras) are
likewise checked as a small batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import se3, triangulate
from .quaternion import qfrom_matrix

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991  # both models accumulate (SCORE_TH - err) per inlier


def _normalize(pts: jnp.ndarray):
    """Hartley normalization. pts [..., N, 2] -> (normed, T [..., 3, 3])."""
    mean = pts.mean(axis=-2, keepdims=True)
    d = jnp.abs(pts - mean).mean(axis=-2, keepdims=True).clip(1e-8)
    s = 1.0 / d
    normed = (pts - mean) * s
    sx, sy = s[..., 0, 0], s[..., 0, 1]
    mx, my = mean[..., 0, 0], mean[..., 0, 1]
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    T = jnp.stack(
        [sx, zeros, -mx * sx, zeros, sy, -my * sy, zeros, zeros, ones], axis=-1
    ).reshape(pts.shape[:-2] + (3, 3))
    return normed, T


def solve_h_8pt(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """DLT homography p2 ~ H p1 from [..., N, 2] point sets -> [..., 3, 3].

    Optional w [..., N] row weights (0 = excluded) allow refitting on all
    RANSAC inliers with fixed shapes."""
    n1, T1 = _normalize(p1)
    n2, T2 = _normalize(p2)
    x, y = n1[..., 0], n1[..., 1]
    u, v = n2[..., 0], n2[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    r1 = jnp.stack([zeros, zeros, zeros, -x, -y, -ones, v * x, v * y, v], axis=-1)
    r2 = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y, -u], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 2N, 9]
    if w is not None:
        A = A * jnp.concatenate([w, w], axis=-1)[..., None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Hn = Vt[..., 8, :].reshape(p1.shape[:-2] + (3, 3))
    H = jnp.linalg.solve(T2, Hn @ T1)
    return H / H[..., 2:3, 2:3].clip(1e-12)  # fails harmlessly if H22~0; scored anyway


def solve_f_8pt(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """8-point fundamental matrix (rank-2 enforced), p2^T F p1 = 0.

    Works for any N >= 8; optional w [..., N] row weights for inlier refits."""
    n1, T1 = _normalize(p1)
    n2, T2 = _normalize(p2)
    x, y = n1[..., 0], n1[..., 1]
    u, v = n2[..., 0], n2[..., 1]
    ones = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, ones], axis=-1)
    if w is not None:
        A = A * w[..., None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Fn = Vt[..., 8, :].reshape(p1.shape[:-2] + (3, 3))
    U, S, Vt2 = jnp.linalg.svd(Fn)
    S2 = S.at[..., 2].set(0.0)
    Fr = U @ (S2[..., None] * Vt2)
    F = jnp.swapaxes(T2, -1, -2) @ Fr @ T1
    return F


def _homog(p):
    return jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,))], axis=-1)


def score_h(H: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray, valid: jnp.ndarray, sigma: float = 1.0):
    """Symmetric transfer error score of homography hypotheses.

    H [..., 3, 3], p1/p2 [N, 2], valid [N] -> (score [...], inlier [..., N])."""
    Hi = jnp.linalg.inv(H)
    x1 = _homog(p1)
    x2 = _homog(p2)
    q2 = jnp.einsum("...ij,nj->...ni", H, x1)
    q1 = jnp.einsum("...ij,nj->...ni", Hi, x2)
    e12 = ((q2[..., :2] / q2[..., 2:3].clip(1e-12) - p2) ** 2).sum(-1) / sigma**2
    e21 = ((q1[..., :2] / q1[..., 2:3].clip(1e-12) - p1) ** 2).sum(-1) / sigma**2
    in12 = e12 < CHI2_H
    in21 = e21 < CHI2_H
    sc = jnp.where(in12, SCORE_TH - e12, 0.0) + jnp.where(in21, SCORE_TH - e21, 0.0)
    inlier = in12 & in21 & valid
    return (sc * valid).sum(-1), inlier


def score_f(F: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray, valid: jnp.ndarray, sigma: float = 1.0):
    """Point-to-epipolar-line error score of fundamental hypotheses."""
    x1 = _homog(p1)
    x2 = _homog(p2)
    l2 = jnp.einsum("...ij,nj->...ni", F, x1)  # line in image 2
    l1 = jnp.einsum("...ji,nj->...ni", F, x2)  # line in image 1
    d2 = (x2 * l2).sum(-1) ** 2 / (l2[..., 0] ** 2 + l2[..., 1] ** 2).clip(1e-12) / sigma**2
    d1 = (x1 * l1).sum(-1) ** 2 / (l1[..., 0] ** 2 + l1[..., 1] ** 2).clip(1e-12) / sigma**2
    in2 = d2 < CHI2_F
    in1 = d1 < CHI2_F
    sc = jnp.where(in2, SCORE_TH - d2, 0.0) + jnp.where(in1, SCORE_TH - d1, 0.0)
    inlier = in1 & in2 & valid
    return (sc * valid).sum(-1), inlier


def ransac_sets(key, n_points: int, valid: jnp.ndarray, n_sets: int = 200, k: int = 8):
    """Draw [n_sets, k] sample indices restricted to valid matches.

    Deterministic under a fixed key (reference seeds RANSAC with 0)."""
    # sample by weighted gumbel top-k so invalid entries are never picked
    g = jax.random.gumbel(key, (n_sets, n_points))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


class TwoViewResult(NamedTuple):
    success: jnp.ndarray  # bool
    used_h: jnp.ndarray  # bool
    T21: jnp.ndarray  # [7] pose of cam2 w.r.t cam1 (world = cam1)
    points: jnp.ndarray  # [N, 3] triangulated in cam1 frame
    is_inlier: jnp.ndarray  # [N]
    score_ratio: jnp.ndarray  # RH


def _rt_hypotheses_from_F(F, K):
    """E = K^T F K -> 4 (R, t) candidates [4, 3, 4]."""
    E = jnp.swapaxes(K, -1, -2) @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    # enforce det +1
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-12)
    return jnp.stack([
        jnp.concatenate([R1, t[..., None]], axis=-1),
        jnp.concatenate([R1, -t[..., None]], axis=-1),
        jnp.concatenate([R2, t[..., None]], axis=-1),
        jnp.concatenate([R2, -t[..., None]], axis=-1),
    ])


def _rt_hypotheses_from_H(H, K):
    """Faugeras 1988 homography decomposition -> 8 (R, t) candidates.

    Follows the ORB-SLAM-style construction the reference's ReconstructH
    implements (src/initializer.cc), rewritten batched in JAX."""
    A = jnp.linalg.solve(K, H @ K)
    U, S, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = S[0], S[1], S[2]
    V = Vt.T

    aux1 = jnp.sqrt(jnp.maximum(0.0, (d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3).clip(1e-12)))
    aux3 = jnp.sqrt(jnp.maximum(0.0, (d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3).clip(1e-12)))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    outs = []
    # case d' = +d2
    aux_st = jnp.sqrt(jnp.maximum(0.0, (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3))) / ((d1 + d3) * d2).clip(1e-12)
    for i in range(4):
        st = aux_st * jnp.array([1.0, -1.0, -1.0, 1.0])[i]
        ct = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2).clip(1e-12)
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st).at[2, 0].set(st).at[2, 2].set(ct)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        outs.append(jnp.concatenate([R, (t / jnp.linalg.norm(t).clip(1e-12))[:, None]], axis=-1))
    # case d' = -d2
    aux_sp = jnp.sqrt(jnp.maximum(0.0, (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3))) / ((d1 - d3) * d2).clip(1e-12)
    for i in range(4):
        sp = aux_sp * jnp.array([1.0, -1.0, -1.0, 1.0])[i]
        cp = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2).clip(1e-12)
        Rp = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]])
        Rp = Rp.at[0, 0].set(cp).at[0, 2].set(sp).at[2, 0].set(sp).at[2, 2].set(-cp)
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        outs.append(jnp.concatenate([R, (t / jnp.linalg.norm(t).clip(1e-12))[:, None]], axis=-1))
    return jnp.stack(outs)  # [8, 3, 4]


def _check_rt(Rt, ray1, ray2, valid, fx, fy, cx, cy, uv1, uv2, max_err2: float = 16.0):
    """Cheirality + reprojection vote for candidate motions.

    Rt [M, 3, 4]; rays/uv [N, ...]. Returns (ngood [M], P3D [M, N, 3],
    good [M, N], median parallax cos proxy)."""
    M = Rt.shape[0]
    q = qfrom_matrix(Rt[..., :3])
    T2 = se3.pack(q, Rt[..., 3])  # [M, 7] cam2 pose (world=cam1)
    T1 = jnp.broadcast_to(se3.identity(), (M, 7))
    P = triangulate.triangulate(
        jnp.broadcast_to(ray1, (M,) + ray1.shape),
        jnp.broadcast_to(ray2, (M,) + ray2.shape),
        T1[:, None, :],
        T2[:, None, :],
    )  # [M, N, 3]
    z1 = P[..., 2]
    z2 = triangulate.depths(P, T2[:, None, :])
    C2 = se3.apply(se3.inverse(T2), jnp.zeros((M, 3)))  # cam2 center in world
    pcos = triangulate.parallax_cos(P, jnp.zeros(3), C2[:, None, :])
    e1 = triangulate.reproj_err2(P, T1[:, None, :], uv1, fx, fy, cx, cy)
    e2 = triangulate.reproj_err2(P, T2[:, None, :], uv2, fx, fy, cx, cy)
    finite = jnp.isfinite(P).all(-1)
    good = (
        valid[None, :]
        & finite
        & (z1 > 0)
        & (z2 > 0)
        & (e1 < max_err2)
        & (e2 < max_err2)
        & (pcos < 0.99998)  # ~0.36deg min parallax, as in CheckRT
    )
    return good.sum(-1), P, good


def initialize_two_view(
    key,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    fx, fy, cx, cy,
    n_sets: int = 200,
    sigma: float = 1.0,
    min_inliers: int = 50,
    min_triangulated_frac: float = 0.5,
) -> TwoViewResult:
    """Full two-view bootstrap on matched pixel pairs (padded, masked).

    Mirrors initializer::Initialize (src/initializer.cc:35-108): joint H/F
    RANSAC, RH model selection at 0.40, then motion reconstruction with a
    cheirality vote. Returns pose T21 with ||t|| = 1 (scale fixed later by
    the map's inverse-depth convention).
    """
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    idx = ransac_sets(key, uv1.shape[0], valid, n_sets=n_sets)
    s1 = uv1[idx]  # [S, 8, 2]
    s2 = uv2[idx]
    Hs = solve_h_8pt(s1, s2)
    Fs = solve_f_8pt(s1, s2)
    sh, _ = score_h(Hs, uv1, uv2, valid, sigma)
    sf, _ = score_f(Fs, uv1, uv2, valid, sigma)
    bh = jnp.argmax(sh)
    bf = jnp.argmax(sf)
    SH, SF = sh[bh], sf[bf]
    Hbest, Fbest = Hs[bh], Fs[bf]
    _, inl_h = score_h(Hbest, uv1, uv2, valid, sigma)
    _, inl_f = score_f(Fbest, uv1, uv2, valid, sigma)
    # refit each model on all of its inliers (weighted rows, fixed shapes) —
    # an 8-point minimal model is too noisy to seed the cheirality vote
    Hbest = solve_h_8pt(uv1, uv2, w=inl_h.astype(uv1.dtype))
    Fbest = solve_f_8pt(uv1, uv2, w=inl_f.astype(uv1.dtype))
    _, inl_h = score_h(Hbest, uv1, uv2, valid, sigma)
    _, inl_f = score_f(Fbest, uv1, uv2, valid, sigma)
    RH = SH / (SH + SF).clip(1e-12)
    use_h = RH > 0.40

    ray1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy, jnp.ones(uv1.shape[0])], -1)
    ray2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy, jnp.ones(uv2.shape[0])], -1)

    RtH = _rt_hypotheses_from_H(Hbest, K)  # [8,3,4]
    RtF = _rt_hypotheses_from_F(Fbest, K)  # [4,3,4]
    RtF = jnp.concatenate([RtF, RtF], axis=0)  # pad to 8 for a single vote shape
    Rt = jnp.where(use_h, RtH, RtF)
    inl = jnp.where(use_h, inl_h, inl_f)
    ngood, P, good = _check_rt(Rt, ray1, ray2, inl, fx, fy, cx, cy, uv1, uv2, max_err2=4.0 * sigma**2)
    # F only has 4 real hypotheses; slots 4..7 are duplicates — kill their votes
    dup = (jnp.arange(8) >= 4) & ~use_h
    ngood = jnp.where(dup, 0, ngood)
    best = jnp.argmax(ngood)
    nbest = ngood[best]
    # winner must dominate: second best clearly lower (ORB-SLAM: 0.7/0.75 factor)
    ngood_sorted = jnp.sort(ngood)[::-1]
    second = ngood_sorted[1]
    n_inl = inl.sum()
    success = (
        (nbest >= min_inliers)
        & (second < 0.75 * nbest)
        & (nbest >= min_triangulated_frac * n_inl.clip(1))
    )
    q = qfrom_matrix(Rt[best, :, :3])
    T21 = se3.pack(q, Rt[best, :, 3])
    return TwoViewResult(
        success=success,
        used_h=use_h,
        T21=T21,
        points=P[best],
        is_inlier=good[best],
        score_ratio=RH,
    )
