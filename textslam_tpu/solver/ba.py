"""Batched Gauss-Newton/LM bundle adjustment with Schur elimination.

This single engine covers the reference's five reprojection/photometric
problem shapes (src/optimizer.cc — InitBA, PoseOptim, LocalBundleAdjustment,
GlobalBA, OptimizeLandmarker/ThetaOptim; SURVEY.md §2.3) by toggling which
blocks are free:

    problem         free poses      free rho   free theta
    InitBA          all but KF0     yes        yes
    PoseOptim       current only    no         no
    LocalBA         window\\{fixed}  yes        yes
    GlobalBA        all but KF0/1   yes        no
    LandmarkOnly    none            yes        yes
    ThetaOptim      none            no         yes

Design (TPU-first, SURVEY.md §7):
- Observations are flat padded SoA arrays with validity masks; every residual
  of a family evaluates in one vmap; per-observation Jacobians w.r.t. the
  LOCAL tangents (6 tgt + 6 host + landmark dof) come from `jax.jacfwd` at
  zero tangent — exact manifold Jacobians, no numeric differencing
  (the reference uses CENTRAL numeric diff: include/nume_BAText.h:98).
- Normal equations assembled by scatter-adds into a dense [6K+6, 6K+6]
  camera system (window K <= ~20 so the dense block is tiny; the +6 is a
  dump block absorbing frozen-pose contributions) and per-landmark
  W [P, 6K] / Hll blocks; Schur complement eliminates landmarks; the reduced
  system solves by Cholesky with LM damping and Jacobi scaling (f32-safe).
- Huber robustification via sqrt-IRLS row scaling.

Scale-out: `parallel.ba_sharded` shards observation batches across a device
mesh and psums H/b — the assembly here is written as pure reductions over
observations to make that a one-line shard_map.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import project
from ..ops.interp import bilinear_stack, patch_bilinear_stack
from ..ops import pallas_kernels


# Photometric sampling precision for the grouped TPU kernel. Default is
# single-pass bf16 (see grouped_bilinear_stack docstring); the env override
# TEXTSLAM_SAMPLER_PRECISION=highest flips to the exact 6-pass mode — used by
# bench_precision.py's multi-seed ATE A/B (VERDICT r1 item 10).
_SAMPLER_PRECISION = (
    jax.lax.Precision.HIGHEST
    if os.environ.get("TEXTSLAM_SAMPLER_PRECISION", "").lower()
    in ("highest", "f32")
    else None
)


def _sample_text_values(images, tgt, uv, pair_feat: int):
    """Sample (I, sobel_x, sobel_y) at the text pattern positions uv [O, S, 2].

    pair_feat > 0 declares that rows arrive grouped in [pair, pair_feat]
    order (one group per (text object, target KF) pair — the layout
    build_text_obs produces), which lets the TPU path use the Pallas region
    kernel (ops.pallas_kernels.grouped_bilinear_stack): one contiguous DMA +
    two MXU contractions per group instead of O scattered patch gathers (the
    gather is ~55% of a BA iteration under XLA's lowering). Masks differ only
    where the grouped region fails to cover a sample that a per-feature patch
    would (boxes wider than the region window) — such samples drop, exactly
    like out-of-image samples. `text_region_coverage` measures that loss."""
    O, S = uv.shape[0], uv.shape[1]
    use_grouped = (
        pair_feat > 0
        and O % pair_feat == 0
        and pallas_kernels.HAVE_PALLAS
        and jax.default_backend() == "tpu"
    )
    if use_grouped:
        G = O // pair_feat
        # sampling stays single-pass bf16 (~1 gray absolute error, below the
        # photometric noise floor). Governing accuracy evidence: the
        # multi-seed paired ATE A/B in bench_precision.py (full pipeline on
        # the real TPU over independently rendered worlds; table recorded in
        # BASELINE.md). The exact 6-pass HIGHEST mode costs ~20% of total BA
        # throughput; grouped_bilinear_stack takes precision=HIGHEST to flip
        # the experiment.
        vals, mask = pallas_kernels.grouped_bilinear_stack(
            images,
            tgt.reshape(G, pair_feat)[:, 0],
            uv.reshape(G, pair_feat * S, 2),
            precision=_SAMPLER_PRECISION,  # default single-pass bf16
        )
        return vals.reshape(O, S, -1), mask.reshape(O, S)
    return patch_bilinear_stack(images, tgt, uv[:, 0], uv)


def inv3x3_spd(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched symmetric 3x3 blocks (adjugate/det).

    Replaces jnp.linalg.pinv (SVD) in the Schur elimination — TPU-hostile.
    Blocks with ~zero determinant return 0 (landmark unobserved)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e = A[..., 1, 1], A[..., 1, 2]
    f = A[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    ok = jnp.abs(det) > 1e-10
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    adj = jnp.stack([
        co00, co01, co02,
        co01, co11, co12,
        co02, co12, co22,
    ], axis=-1).reshape(A.shape[:-2] + (3, 3))
    return adj * inv_det[..., None, None]

# cost charged to a residual that is nominally valid but currently broken
# (behind camera / negative plane depth / sampled off-image)
BROKEN_PENALTY = 1.0e4


class SceneObs(NamedTuple):
    """Padded scene-point reprojection observations (2-dim residuals).

    An observation ties a window KF (tgt) to a point hosted in another KF
    (host); the point is ray/rho in host coords (src/mapPts.h:80)."""

    tgt: jnp.ndarray  # [O] int32 window slot of the observing KF
    host: jnp.ndarray  # [O] int32 window slot of host KF, or K (dump) if frozen
    host_frozen_pose: jnp.ndarray  # [O, 7] host pose snapshot if not in window
    host_in_window: jnp.ndarray  # [O] bool
    point: jnp.ndarray  # [O] int32 index into rho [P]
    ray: jnp.ndarray  # [O, 3] host unit-plane ray
    uv: jnp.ndarray  # [O, 2] observed pixel (level-0 coords)
    weight: jnp.ndarray  # [O] residual weight (1/sigma_px)
    valid: jnp.ndarray  # [O] bool


class TextObs(NamedTuple):
    """Padded text photometric observations (8-dim residuals, one per text
    feature at one pyramid level; src/setting.h:48-72, include/nume_BAText.h).

    The 8-sample INTERVAL8 neighbour pattern is positioned by fixed pixel
    offsets around the feature (src/tool.cc:1540-1568); pattern rays are
    derived host-side and stored explicitly."""

    tgt: jnp.ndarray  # [O] int32 window slot of observing KF
    host: jnp.ndarray  # [O] int32 window slot of host KF, or K if frozen
    host_frozen_pose: jnp.ndarray  # [O, 7]
    host_in_window: jnp.ndarray  # [O] bool
    text: jnp.ndarray  # [O] int32 index into theta [T]
    rays: jnp.ndarray  # [O, 8, 3] pattern rays in host frame
    ref_inten: jnp.ndarray  # [O, 8] reference normalized intensities
    mu_sigma: jnp.ndarray  # [O, 2] target-frame (mu, sigma) at this level
    weight: jnp.ndarray  # [O]
    valid: jnp.ndarray  # [O] bool
    level: int = 0  # static: pyramid level of this batch


class BAProblem(NamedTuple):
    poses: jnp.ndarray  # [K, 7] window KF poses (Tcw)
    pose_free: jnp.ndarray  # [K] bool
    rho: jnp.ndarray  # [P] inverse depths
    rho_free: jnp.ndarray  # [P] bool
    theta: jnp.ndarray  # [T, 3] text planes
    theta_free: jnp.ndarray  # [T] bool
    scene: Optional[SceneObs]
    text: Optional[TextObs]
    images: Optional[jnp.ndarray]  # [K, H_l, W_l] target intensities at text level
    fx: jnp.ndarray = jnp.float32(1.0)
    fy: jnp.ndarray = jnp.float32(1.0)
    cx: jnp.ndarray = jnp.float32(0.0)
    cy: jnp.ndarray = jnp.float32(0.0)


def _gather_pose(poses_ext: jnp.ndarray, slot, frozen_pose, in_window):
    """Current pose of a block: window pose if in window else frozen snapshot."""
    return jnp.where(in_window, poses_ext[slot], frozen_pose)


def _scene_residual(delta_tgt, delta_host, drho, obs_ray, obs_uv, tgt_pose, host_pose, rho, fx, fy, cx, cy):
    """2-dim reprojection residual at local tangents (the AD point).

    Model (include/auto_BAScene.h:43-84): p_host = ray/rho;
    p_c = Tcw ∘ Trw^-1 p_host; r = K(p_c) - uv."""
    T_t = se3.retract(tgt_pose, delta_tgt)
    T_h = se3.retract(host_pose, delta_host)
    p_h = obs_ray / (rho + drho)
    p_c = se3.apply(se3.compose(T_t, se3.inverse(T_h)), p_h)
    return project(p_c, fx, fy, cx, cy) - obs_uv, p_c[2]


def _huber_w(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """sqrt-IRLS Huber weight for squared norm r2 and threshold delta."""
    rn = jnp.sqrt(r2.clip(1e-12))
    return jnp.where(rn <= delta, 1.0, jnp.sqrt(delta / rn))


def scene_terms(problem: BAProblem, huber: float):
    """Residuals + tangent Jacobians for all scene observations (analytic).

    Closed-form manifold Jacobians of r = w(K(A p_h) - uv), A = T_t ∘ T_h⁻¹,
    p_h = ray/ρ. The retraction rotates on the quaternion manifold but
    updates translation ADDITIVELY (Ceres block structure, geometry.se3
    .retract), so the rotation tangent acts about the camera center:
        dp_c/dδ_tgt  = [-[p_c - t_t]ₓ | I]
        dp_c/dδ_host = [ R_A [p_h - t_h]ₓ | -R_A ]
        dp_c/dρ      = -R_A p_h / ρ
    (replaces the reference's numeric/ceres-autodiff functors and the earlier
    vmap(jacfwd) — ~5x fewer flops per row; validated against jacfwd in
    tests/test_solver_jacobians.py).

    Returns dict with per-obs r [O,2], J_t [O,2,6], J_h [O,2,6], J_l [O,2,1],
    w [O] (validity x huber x weight), cost [O] (robust, squared)."""
    from ..geometry.quaternion import qto_matrix
    from ..geometry.camera import project_jacobian
    from ..geometry.sim3 import skew

    s = problem.scene
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[s.tgt]
    host_pose = _gather_pose(poses_ext, s.host, s.host_frozen_pose, s.host_in_window[:, None])
    rho = problem.rho[s.point]

    A = se3.compose(tgt_pose, se3.inverse(host_pose))  # [O, 7]
    R_A = qto_matrix(A[:, :4])  # [O, 3, 3]
    p_h = s.ray / rho[:, None]
    p_c = se3.apply(A, p_h)
    uv_pred = project(p_c, problem.fx, problem.fy, problem.cx, problem.cy)
    r = uv_pred - s.uv
    z = p_c[:, 2]

    Juv = project_jacobian(p_c, problem.fx, problem.fy)  # [O, 2, 3]
    J_t = jnp.concatenate([
        jnp.einsum("oij,ojk->oik", Juv, -skew(p_c - tgt_pose[:, 4:7])),
        Juv,
    ], axis=-1)  # [O, 2, 6]
    RAsk = jnp.einsum("oij,ojk->oik", R_A, skew(p_h - host_pose[:, 4:7]))
    JuvRA = jnp.einsum("oij,ojk->oik", Juv, R_A)
    J_h = jnp.concatenate([
        jnp.einsum("oij,ojk->oik", Juv, RAsk),
        -JuvRA,
    ], axis=-1)
    J_l = jnp.einsum("oij,oj->oi", JuvRA, -p_h / rho[:, None])[..., None]  # [O, 2, 1]

    r = r * s.weight[:, None]
    J_t = J_t * s.weight[:, None, None]
    J_h = J_h * s.weight[:, None, None]
    J_l = J_l * s.weight[:, None, None]
    ok = s.valid & (z > 1e-4) & (rho > 1e-6)
    r2 = (r * r).sum(-1)
    hw = _huber_w(r2, huber)
    w = jnp.where(ok, hw, 0.0)
    # robust cost (Huber rho applied to weighted residual norm^2); residuals
    # that a step breaks (cheirality flip) cost a constant penalty so LM
    # cannot "win" by pushing points behind the camera
    rn = jnp.sqrt(r2.clip(1e-12))
    cost = jnp.where(rn <= huber, r2, 2 * huber * rn - huber * huber)
    cost = jnp.where(ok, cost, jnp.where(s.valid, BROKEN_PENALTY, 0.0))
    # hard-zero invalid rows: padded/degenerate entries can carry NaN
    # Jacobians and 0*NaN = NaN would poison the scatter-adds
    okm = ok[:, None]
    r = jnp.where(okm, r, 0.0)
    J_t = jnp.where(okm[..., None], J_t, 0.0)
    J_h = jnp.where(okm[..., None], J_h, 0.0)
    J_l = jnp.where(okm[..., None], J_l, 0.0)
    # zero Jacobians of frozen landmark / frozen host blocks
    J_l = J_l * problem.rho_free[s.point][:, None, None]
    J_h = J_h * s.host_in_window[:, None, None]
    return {"r": r, "J_t": J_t, "J_h": J_h, "J_l": J_l, "w": w, "cost": cost, "chi2": r2}


def scene_terms_ad(problem: BAProblem, huber: float):
    """jacfwd reference implementation of scene_terms (kept for validation)."""
    s = problem.scene
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[s.tgt]
    host_pose = _gather_pose(poses_ext, s.host, s.host_frozen_pose, s.host_in_window[:, None])
    rho = problem.rho[s.point]

    def res(dt, dh, dr, ray, uv, tp, hp, rh):
        r, _ = _scene_residual(dt, dh, dr, ray, uv, tp, hp, rh, problem.fx, problem.fy, problem.cx, problem.cy)
        return r

    zeros6 = jnp.zeros(6)
    zero1 = jnp.zeros(())
    f = jax.vmap(
        lambda ray, uv, tp, hp, rh: jax.jacfwd(res, argnums=(0, 1, 2))(
            zeros6, zeros6, zero1, ray, uv, tp, hp, rh
        )
    )
    J_t, J_h, J_l = f(s.ray, s.uv, tgt_pose, host_pose, rho)
    r, z = jax.vmap(
        lambda ray, uv, tp, hp, rh: _scene_residual(
            zeros6, zeros6, zero1, ray, uv, tp, hp, rh, problem.fx, problem.fy, problem.cx, problem.cy
        )
    )(s.ray, s.uv, tgt_pose, host_pose, rho)
    w = s.weight
    return {
        "r": r * w[:, None],
        "J_t": J_t * w[:, None, None],
        "J_h": (J_h * w[:, None, None]) * s.host_in_window[:, None, None],
        "J_l": (J_l[..., None] * w[:, None, None]) * problem.rho_free[s.point][:, None, None],
        "valid_z": z,
    }


def _text_residual(delta_tgt, delta_host, dtheta, rays, ref, mu_sigma, tgt_pose, host_pose, theta, imgs, tgt_i, fx, fy, cx, cy):
    """8-dim photometric residual (include/nume_BAText.h:22-100 semantics):
    project each pattern ray via the plane, sample target intensity, compare
    normalized values: r_k = (I_k - mu)/sigma - ref_k.

    Samples through the whole image stack with the target index fused into
    the gather (ops.interp.bilinear_stack) — indexing imgs[tgt] per
    observation would materialize an image copy per residual row."""
    T_t = se3.retract(tgt_pose, delta_tgt)
    T_h = se3.retract(host_pose, delta_host)
    th = theta + dtheta
    rho = -(rays * th).sum(-1)  # [8]
    p_h = rays / rho[:, None]
    T_th = se3.compose(T_t, se3.inverse(T_h))
    p_c = se3.apply(T_th, p_h)
    uv = project(p_c, fx, fy, cx, cy)
    I, mask = bilinear_stack(imgs, tgt_i, uv)
    mu, sigma = mu_sigma[0], mu_sigma[1]
    r = (I - mu) / sigma - ref
    return r, (mask & (p_c[..., 2] > 1e-4) & (rho > 1e-6))


def _text_level_K(problem: BAProblem, level: int):
    """Level-l intrinsics for the x2 direct pyramid (text residuals project
    into the level image; using level-0 K against a level-l image samples at
    2^l-scaled coordinates)."""
    sc = 2.0**level
    return problem.fx / sc, problem.fy / sc, problem.cx / sc, problem.cy / sc


def text_terms(problem: BAProblem, huber: float, pair_feat: int = 0):
    """Residuals + analytic tangent Jacobians for text observations at one
    pyramid level.

    r_k = w((I_l(u_k) - mu)/sigma - ref_k), u_k = K_l(A m_k / rho_k),
    rho_k = -m_k^T theta, A = T_t ∘ T_h⁻¹. Chain rule with image gradients
    sampled from the pyramid's Sobel channels (dI/dx = sobel/8) — the analytic
    replacement for the reference's CENTRAL numeric diff
    (include/nume_BAText.h:98) and for vmap(jacfwd):
        dp_c/dδ_tgt  = [-[p_c - t_t]ₓ | I]
        dp_c/dδ_host = [ R_A [p_h - t_h]ₓ | -R_A ]
        dp_c/dθ      = R_A (m mᵀ)/ρ²
    problem.images must be [K, H_l, W_l, 3] = (I, sobel_x, sobel_y).
    """
    from ..geometry.quaternion import qto_matrix
    from ..geometry.camera import project_jacobian
    from ..geometry.sim3 import skew

    t = problem.text
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[t.tgt]
    host_pose = _gather_pose(poses_ext, t.host, t.host_frozen_pose, t.host_in_window[:, None])
    theta = problem.theta[t.text]
    fxl, fyl, cxl, cyl = _text_level_K(problem, t.level)

    A = se3.compose(tgt_pose, se3.inverse(host_pose))  # [O, 7]
    R_A = qto_matrix(A[:, :4])  # [O, 3, 3]
    rho = -(t.rays * theta[:, None, :]).sum(-1)  # [O, 8]
    p_h = t.rays / rho[..., None]
    p_c = se3.apply(A[:, None, :], p_h)  # [O, 8, 3]
    uv = project(p_c, fxl, fyl, cxl, cyl)
    # clustered sampling: grouped Pallas region kernel on TPU, per-feature
    # 8x8 patch gathers elsewhere (see _sample_text_values)
    vals, mask = _sample_text_values(problem.images, t.tgt, uv, pair_feat)
    I = vals[..., 0]
    g = vals[..., 1:3] / 8.0  # sobel -> dI/dpx
    mu = t.mu_sigma[:, 0:1]
    sigma = t.mu_sigma[:, 1:2]
    r = (I - mu) / sigma - t.ref_inten
    sample_ok = mask & (p_c[..., 2] > 1e-4) & (rho > 1e-6)

    Juv = project_jacobian(p_c, fxl, fyl)  # [O, 8, 2, 3]
    Jpix = jnp.einsum("okj,okji->oki", g / sigma[..., None], Juv)  # [O, 8, 3]
    J_t = jnp.concatenate([
        jnp.einsum("oki,okij->okj", Jpix, -skew(p_c - tgt_pose[:, None, 4:7])),
        Jpix,
    ], axis=-1)  # [O, 8, 6]
    JpixR = jnp.einsum("oki,oij->okj", Jpix, R_A)
    J_h = jnp.concatenate([
        jnp.einsum("oki,okij->okj", JpixR, skew(p_h - host_pose[:, None, 4:7])),
        -JpixR,
    ], axis=-1)
    a = (JpixR * t.rays).sum(-1)  # [O, 8]
    J_l = a[..., None] * t.rays / (rho * rho)[..., None]  # [O, 8, 3]

    w_row = t.weight[:, None] * sample_ok
    r = r * w_row
    J_t = J_t * w_row[..., None]
    J_h = J_h * w_row[..., None]
    J_l = J_l * w_row[..., None]
    ok = t.valid & (sample_ok.sum(-1) >= 4)
    r2 = (r * r).sum(-1)
    hw = _huber_w(r2, huber)
    w = jnp.where(ok, hw, 0.0)
    rn = jnp.sqrt(r2.clip(1e-12))
    cost = jnp.where(rn <= huber, r2, 2 * huber * rn - huber * huber)
    cost = jnp.where(ok, cost, jnp.where(t.valid, BROKEN_PENALTY, 0.0))
    okm = ok[:, None]
    r = jnp.where(okm, r, 0.0)
    J_t = jnp.where(okm[..., None], J_t, 0.0)
    J_h = jnp.where(okm[..., None], J_h, 0.0)
    J_l = jnp.where(okm[..., None], J_l, 0.0)
    J_l = J_l * problem.theta_free[t.text][:, None, None]
    J_h = J_h * t.host_in_window[:, None, None]
    return {"r": r, "J_t": J_t, "J_h": J_h, "J_l": J_l, "w": w, "cost": cost, "chi2": r2}


def text_terms_ad(problem: BAProblem, huber: float):
    """jacfwd reference implementation (validation only; intensity channel)."""
    t = problem.text
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[t.tgt]
    host_pose = _gather_pose(poses_ext, t.host, t.host_frozen_pose, t.host_in_window[:, None])
    theta = problem.theta[t.text]
    imgs = problem.images[..., 0] if problem.images.ndim == 4 else problem.images
    fxl, fyl, cxl, cyl = _text_level_K(problem, t.level)

    def res(dt, dh, dth, rays, ref, ms, tp, hp, th, tgt_i):
        r, _ = _text_residual(dt, dh, dth, rays, ref, ms, tp, hp, th, imgs, tgt_i, fxl, fyl, cxl, cyl)
        return r

    zeros6 = jnp.zeros(6)
    zeros3 = jnp.zeros(3)
    jac = jax.vmap(
        lambda rays, ref, ms, tp, hp, th, tgt_i: jax.jacfwd(res, argnums=(0, 1, 2))(
            zeros6, zeros6, zeros3, rays, ref, ms, tp, hp, th, tgt_i
        )
    )
    J_t, J_h, J_l = jac(t.rays, t.ref_inten, t.mu_sigma, tgt_pose, host_pose, theta, t.tgt)
    r, sample_ok = jax.vmap(
        lambda rays, ref, ms, tp, hp, th, tgt_i: _text_residual(
            zeros6, zeros6, zeros3, rays, ref, ms, tp, hp, th, imgs, tgt_i,
            fxl, fyl, cxl, cyl,
        )
    )(t.rays, t.ref_inten, t.mu_sigma, tgt_pose, host_pose, theta, t.tgt)
    return {"r": r, "J_t": J_t, "J_h": J_h, "J_l": J_l, "sample_ok": sample_ok}


def _pose_indices(slot, K):
    """Row indices of a pose block in the extended [6(K+1)] system (slot K =
    dump block for frozen poses)."""
    return slot[:, None] * 6 + jnp.arange(6)[None, :]


# Camera-assembly path switch: the one-hot MXU reduction materializes an
# [O, (K+1)^2] selection matrix whose FLOPs and XLA temporaries grow as
# O * K^2 — measured 2.45 GB of XLA temp at K=512/O=131k (VERDICT r4
# missing #1). Windows (K <= 32) stay on the one-hot; larger problems
# (loop-time GlobalBA over ALL keyframes, src/optimizer.cc:334-453) reduce
# by sorted segment_sum over the (tgt, host) pair id instead: O(O) work,
# [Kp^2, 12, 12] accumulator (151 MB at K=512 — flat in O).
ONEHOT_MAX_PAIR_BUCKETS = 4096  # Kp^2 <= this -> one-hot path (K <= 63)


def assemble_camera_system(terms, tgt, host, K):
    """Camera-side normal equations without per-row scatter collisions.

    Small K (windows): a scatter-add over pose blocks collides
    catastrophically on TPU (every observation lands in one of <= (K+1)^2
    blocks, so the scatter serializes per collision) — reduce per
    (tgt, host) pair with a one-hot matmul on the MXU instead.
    Large K (loop-time global passes): the one-hot's O*K^2 cost is the wall;
    sort rows by pair id and reduce with segment_sum (collisions are rare —
    observations spread over Kp^2 >> K buckets). Both paths then place the
    four 6x6 quadrants with dense reshapes/transposes.

    Returns (Hcc [6K+6, 6K+6], bc [6K+6]) in the extended system."""
    J = jnp.concatenate([terms["J_t"], terms["J_h"]], axis=-1)  # [O, R, 12]
    w = terms["w"][:, None, None]
    Jw = J * w
    H_blocks = jnp.einsum("ori,orj->oij", Jw, J)  # [O, 12, 12]
    b_blocks = jnp.einsum("ori,or->oi", Jw, terms["r"])  # [O, 12]

    Kp = K + 1
    pair = tgt * Kp + host  # [O]
    if Kp * Kp <= ONEHOT_MAX_PAIR_BUCKETS:
        S = jax.nn.one_hot(pair, Kp * Kp, dtype=H_blocks.dtype)  # [O, Kp^2]
        Hp = jnp.einsum("oij,op->pij", H_blocks, S).reshape(Kp, Kp, 12, 12)
        bp = jnp.einsum("oi,op->pi", b_blocks, S).reshape(Kp, Kp, 12)
    else:
        order = jnp.argsort(pair)
        pair_s = pair[order]
        Hp = jax.ops.segment_sum(
            H_blocks[order], pair_s, num_segments=Kp * Kp,
            indices_are_sorted=True,
        ).reshape(Kp, Kp, 12, 12)
        bp = jax.ops.segment_sum(
            b_blocks[order], pair_s, num_segments=Kp * Kp,
            indices_are_sorted=True,
        ).reshape(Kp, Kp, 12)

    n = 6 * Kp
    # off-diagonal quadrants placed at (tgt, host) and (host, tgt)
    M_th = Hp[:, :, 0:6, 6:12].transpose(0, 2, 1, 3).reshape(n, n)
    M_ht = Hp[:, :, 6:12, 0:6].transpose(1, 2, 0, 3).reshape(n, n)
    # diagonal blocks: sum the tt quadrant over hosts and hh over targets
    D = Hp[:, :, 0:6, 0:6].sum(1) + Hp[:, :, 6:12, 6:12].sum(0)
    Hcc = M_th + M_ht
    ar = jnp.arange(Kp)
    Hcc = Hcc.reshape(Kp, 6, Kp, 6).at[ar, :, ar, :].add(D).reshape(n, n)
    bc = (bp[:, :, 0:6].sum(1) + bp[:, :, 6:12].sum(0)).reshape(n)
    return Hcc, bc


def assemble_landmark_system(terms, tgt, host, lm_idx, n_landmarks, K, lm_dim,
                             with_coupling: bool = True):
    """Per-landmark blocks: W [L, 6K+6, D], Hll [L, D, D], bl [L, D].

    Two paths: small landmark pools (text theta: L ~ tens) reduce by one-hot
    matmul on the MXU (scatter would serialize on index collisions); large
    pools (scene rho) scatter-add directly — collisions are rare there and
    the one-hot matrix would be too wide.

    with_coupling=False skips the pose-landmark coupling blocks W entirely
    (returned as a zero placeholder) — used by the no-free-poses fast path
    (OptimizeLandmarker semantics, src/optimizer.cc:456-562: all poses
    fixed), where W only ever multiplies a zero camera step and its
    [L, 6K+6, D] footprint would dominate memory at global-map scale."""
    J = jnp.concatenate([terms["J_t"], terms["J_h"]], axis=-1)  # [O, R, 12]
    Jl = terms["J_l"]  # [O, R, D]
    w = terms["w"][:, None, None]
    Jlw = Jl * w
    Hll_o = jnp.einsum("ori,orj->oij", Jlw, Jl)  # [O, D, D]
    bl_o = jnp.einsum("ori,or->oi", Jlw, terms["r"])
    Kp = K + 1
    n = 6 * Kp
    if not with_coupling:
        Hll = jax.ops.segment_sum(Hll_o, lm_idx, num_segments=n_landmarks)
        bl = jax.ops.segment_sum(bl_o, lm_idx, num_segments=n_landmarks)
        return jnp.zeros((1,)), Hll, bl
    W_o = jnp.einsum("ori,orj->oij", J * w, Jl)  # [O, 12, D]

    if n_landmarks * Kp <= 16384:
        Sl = jax.nn.one_hot(lm_idx, n_landmarks, dtype=J.dtype)  # [O, L]
        Hll = jnp.einsum("oij,ol->lij", Hll_o, Sl)
        bl = jnp.einsum("oi,ol->li", bl_o, Sl)
        St = jax.nn.one_hot(lm_idx * Kp + tgt, n_landmarks * Kp, dtype=J.dtype)
        Sh = jax.nn.one_hot(lm_idx * Kp + host, n_landmarks * Kp, dtype=J.dtype)
        Wt = jnp.einsum("oid,op->pid", W_o[:, 0:6, :], St)
        Wh = jnp.einsum("oid,op->pid", W_o[:, 6:12, :], Sh)
        W = (Wt + Wh).reshape(n_landmarks, n, lm_dim)
        return W, Hll, bl

    idx = jnp.concatenate([_pose_indices(tgt, K), _pose_indices(host, K)], axis=-1)
    Hll = jnp.zeros((n_landmarks, lm_dim, lm_dim)).at[lm_idx].add(Hll_o)
    bl = jnp.zeros((n_landmarks, lm_dim)).at[lm_idx].add(bl_o)
    W = jnp.zeros((n_landmarks, n, lm_dim)).at[lm_idx[:, None, None], idx[:, :, None], jnp.arange(lm_dim)[None, None, :]].add(W_o)
    return W, Hll, bl


class LMState(NamedTuple):
    poses: jnp.ndarray
    rho: jnp.ndarray
    theta: jnp.ndarray
    lam: jnp.ndarray
    cost: jnp.ndarray


def _apply_update(problem: BAProblem, delta_c, delta_rho, delta_theta):
    K = problem.poses.shape[0]
    d = delta_c[: 6 * K].reshape(K, 6) * problem.pose_free[:, None]
    poses = jnp.where(
        problem.pose_free[:, None], se3.retract(problem.poses, d), problem.poses
    )
    rho = problem.rho + delta_rho * problem.rho_free
    theta = problem.theta + delta_theta * problem.theta_free[:, None]
    return poses, rho, theta


def scene_cost(problem: BAProblem, huber: float) -> jnp.ndarray:
    """Residual-only robust cost (no Jacobians — for LM accept/reject)."""
    s = problem.scene
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[s.tgt]
    host_pose = _gather_pose(poses_ext, s.host, s.host_frozen_pose, s.host_in_window[:, None])
    rho = problem.rho[s.point]
    zeros6 = jnp.zeros(6)
    zero1 = jnp.zeros(())
    r, z = jax.vmap(
        lambda ray, uv, tp, hp, rh: _scene_residual(
            zeros6, zeros6, zero1, ray, uv, tp, hp, rh, problem.fx, problem.fy, problem.cx, problem.cy
        )
    )(s.ray, s.uv, tgt_pose, host_pose, rho)
    r = r * s.weight[:, None]
    ok = s.valid & (z > 1e-4) & (rho > 1e-6)
    r2 = (r * r).sum(-1)
    rn = jnp.sqrt(r2.clip(1e-12))
    cost = jnp.where(rn <= huber, r2, 2 * huber * rn - huber * huber)
    return jnp.where(ok, cost, jnp.where(s.valid, BROKEN_PENALTY, 0.0)).sum()


def text_cost(problem: BAProblem, huber: float, pair_feat: int = 0) -> jnp.ndarray:
    t = problem.text
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[t.tgt]
    host_pose = _gather_pose(poses_ext, t.host, t.host_frozen_pose, t.host_in_window[:, None])
    theta = problem.theta[t.text]
    fxl, fyl, cxl, cyl = _text_level_K(problem, t.level)
    from ..geometry.quaternion import qto_matrix

    A = se3.compose(tgt_pose, se3.inverse(host_pose))
    rho = -(t.rays * theta[:, None, :]).sum(-1)
    p_h = t.rays / rho[..., None]
    p_c = se3.apply(A[:, None, :], p_h)
    uv = project(p_c, fxl, fyl, cxl, cyl)
    vals, mask = _sample_text_values(problem.images, t.tgt, uv, pair_feat)
    I = vals[..., 0]
    r = (I - t.mu_sigma[:, 0:1]) / t.mu_sigma[:, 1:2] - t.ref_inten
    sample_ok = mask & (p_c[..., 2] > 1e-4) & (rho > 1e-6)
    r = r * (t.weight[:, None] * sample_ok)
    ok = t.valid & (sample_ok.sum(-1) >= 4)
    r2 = (r * r).sum(-1)
    rn = jnp.sqrt(r2.clip(1e-12))
    cost = jnp.where(rn <= huber, r2, 2 * huber * rn - huber * huber)
    return jnp.where(ok, cost, jnp.where(t.valid, BROKEN_PENALTY, 0.0)).sum()


def _total_cost(problem: BAProblem, hubers) -> jnp.ndarray:
    c = jnp.float32(0.0)
    if problem.scene is not None:
        c = c + scene_cost(problem, hubers["scene"])
    if problem.text is not None:
        c = c + text_cost(problem, hubers["text"])
    return c


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "huber_scene", "huber_text", "lam0", "lam_up",
                     "lam_down", "text_pair_feat", "lam_min", "lam_max",
                     "no_free_poses"),
)
def solve_ba(
    problem: BAProblem,
    n_iters: int = 10,
    huber_scene: float = 2.447,
    huber_text: float = 3.0,
    lam0: float = 1e-4,
    lam_up: float = 10.0,
    lam_down: float = 0.1,
    text_pair_feat: int = 0,
    lam_min: float = 1e-12,
    lam_max: float = 1e8,
    no_free_poses: bool = False,
):
    """Damped LM loop (fixed iteration count, accept/reject inside).

    Mirrors Ceres TRUST_REGION/LM semantics closely enough for parity: the
    reference runs `its` iterations per pyramid level with Huber losses and
    fixed blocks (src/optimizer.cc:1598-1607).

    All solver contractions (Jacobian chains, J^T J assembly, Schur, back-
    substitution) trace under f32 matmul precision: bf16 normal equations
    and Schur complements are numerically fragile for ill-conditioned
    windows, and these contractions cost only ~25% of BA throughput — the
    hot photometric sampling kernel stays single-pass bf16 (pinned in
    _sample_text_values; its ~1-gray rounding sits below the photometric
    noise floor and A/B ATE runs show no difference).

    no_free_poses=True declares (statically) that every pose block is fixed
    — the OptimizeLandmarker shape (src/optimizer.cc:456-562). The camera
    assembly, pose-landmark coupling W, Schur complement, and Cholesky are
    all skipped (the camera step is identically zero in that regime: the
    free-mask zeroing already forces delta_c = 0, so this path is
    bit-equivalent, just without the O(O*K^2) assembly wall)."""
    with jax.default_matmul_precision("highest"):
        return _solve_ba_body(problem, n_iters, huber_scene, huber_text,
                              lam0, lam_up, lam_down, text_pair_feat,
                              lam_min=lam_min, lam_max=lam_max,
                              no_free_poses=no_free_poses)


def _solve_ba_body(problem, n_iters, huber_scene, huber_text, lam0, lam_up,
                   lam_down, text_pair_feat, lam_min=1e-12, lam_max=1e8,
                   build_override=None, no_free_poses=False):
    K = problem.poses.shape[0]
    P = problem.rho.shape[0]
    T = problem.theta.shape[0]
    n = 6 * (K + 1)
    hubers = {"scene": huber_scene, "text": huber_text}

    free_mask = jnp.concatenate(
        [jnp.repeat(problem.pose_free, 6), jnp.zeros(6, dtype=bool)]
    )

    def build(problem):
        # no-free-poses problems keep 1-element camera placeholders: the
        # camera step is identically zero there, so assembling Hcc/bc (and
        # the W coupling) would be pure O(O*K^2) waste at global-map scale
        Hcc = jnp.zeros((1, 1) if no_free_poses else (n, n))
        bc = jnp.zeros((1,) if no_free_poses else (n,))
        Wr = Hr = br = Wt = Ht = bt = None
        cost = jnp.float32(0.0)
        if problem.scene is not None:
            ts = scene_terms(problem, huber_scene)
            if not no_free_poses:
                Hcc, bc = assemble_camera_system(ts, problem.scene.tgt, problem.scene.host, K)
            Wr, Hr, br = assemble_landmark_system(
                ts, problem.scene.tgt, problem.scene.host, problem.scene.point,
                P, K, 1, with_coupling=not no_free_poses,
            )
            cost += ts["cost"].sum()
        if problem.text is not None:
            tt = text_terms(problem, huber_text, text_pair_feat)
            if not no_free_poses:
                H2, b2 = assemble_camera_system(tt, problem.text.tgt, problem.text.host, K)
                Hcc += H2
                bc += b2
            Wt, Ht, bt = assemble_landmark_system(
                tt, problem.text.tgt, problem.text.host, problem.text.text,
                T, K, 3, with_coupling=not no_free_poses,
            )
            cost += tt["cost"].sum()
        return Hcc, bc, Wr, Hr, br, Wt, Ht, bt, cost

    def solve_from(sys, lam):
        """Compute the damped step from an assembled system."""
        Hcc, bc, Wr, Hr, br, Wt, Ht, bt = sys
        if no_free_poses:
            # landmark blocks decouple completely: per-landmark damped solves
            delta_c = jnp.zeros(n)
            if problem.scene is not None:
                Hr_d = Hr[:, 0, 0] * (1.0 + lam) + 1e-8
                Hr_inv = jnp.where(Hr[:, 0, 0] > 1e-12, 1.0 / Hr_d, 0.0)
                drho = Hr_inv * (-br[:, 0])
            else:
                drho = jnp.zeros_like(problem.rho)
            if problem.text is not None:
                Ht_d = Ht + (lam * Ht + 1e-8) * jnp.eye(3)
                dtheta = jnp.einsum("pde,pe->pd", inv3x3_spd(Ht_d), -bt)
            else:
                dtheta = jnp.zeros_like(problem.theta)
            return delta_c, drho, dtheta
        H_red = Hcc
        b_red = bc
        Hr_inv = None
        Ht_inv = None
        if problem.scene is not None:
            Hr_d = Hr[:, 0, 0] * (1.0 + lam) + 1e-8
            Hr_inv = jnp.where(Hr[:, 0, 0] > 1e-12, 1.0 / Hr_d, 0.0)
            H_red = H_red - jnp.einsum("pid,p,pjd->ij", Wr, Hr_inv, Wr)
            b_red = b_red - jnp.einsum("pid,p,pd->i", Wr, Hr_inv, br)
        if problem.text is not None:
            Ht_d = Ht + (lam * Ht + 1e-8) * jnp.eye(3)
            Ht_inv = inv3x3_spd(Ht_d)
            H_red = H_red - jnp.einsum("pid,pde,pje->ij", Wt, Ht_inv, Wt)
            b_red = b_red - jnp.einsum("pid,pde,pe->i", Wt, Ht_inv, bt)

        diag = jnp.diagonal(H_red)
        diag_safe = jnp.where(free_mask & (diag > 1e-12), diag, 1.0)
        Dinv = 1.0 / jnp.sqrt(diag_safe)
        Hs = H_red * Dinv[:, None] * Dinv[None, :]
        Hs = jnp.where(free_mask[:, None] & free_mask[None, :], Hs, 0.0)
        Hs = Hs + (lam + 1e-8) * jnp.eye(n) + jnp.diag(~free_mask * 1.0)
        bs = jnp.where(free_mask, b_red * Dinv, 0.0)
        L = jnp.linalg.cholesky(Hs)
        delta_s = jax.scipy.linalg.cho_solve((L, True), -bs)
        delta_c = delta_s * Dinv * free_mask

        if problem.scene is not None:
            drho = Hr_inv * (-br[:, 0] - jnp.einsum("pid,i->pd", Wr, delta_c)[:, 0])
        else:
            drho = jnp.zeros_like(problem.rho)
        if problem.text is not None:
            dtheta = jnp.einsum(
                "pde,pe->pd", Ht_inv, -bt - jnp.einsum("pid,i->pd", Wt, delta_c)
            )
        else:
            dtheta = jnp.zeros_like(problem.theta)
        return delta_c, drho, dtheta

    def step(carry, _):
        """Deferred-accept LM: ONE build per iteration. The trial point's
        build provides both its cost (accept/reject against the best) and,
        on accept, the next linearization; on reject the cached best system
        is retried with a larger damping — textbook LM, but residuals and
        Jacobians are evaluated exactly once per iteration."""
        best_params, best_cost, best_sys, trial_params, lam = carry
        sys_t, cost_t = build_sys(problem, trial_params)
        finite = (
            jnp.isfinite(cost_t)
            & jnp.isfinite(trial_params[0]).all()
            & jnp.isfinite(trial_params[1]).all()
            & jnp.isfinite(trial_params[2]).all()
        )
        accept = (cost_t < best_cost) & finite
        params = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), trial_params, best_params
        )
        cost = jnp.where(accept, cost_t, best_cost)
        sys = jax.tree.map(lambda a, b: jnp.where(accept, a, b), sys_t, best_sys)
        lam = jnp.clip(jnp.where(accept, lam * lam_down, lam * lam_up),
                       lam_min, lam_max)

        prob = problem._replace(poses=params[0], rho=params[1], theta=params[2])
        delta_c, drho, dtheta = solve_from(sys, lam)
        new_poses, new_rho, new_theta = _apply_update(prob, delta_c, drho, dtheta)
        return (params, cost, sys, (new_poses, new_rho, new_theta), lam), None

    def build_sys(problem, params):
        """Assemble the normal-equation system at `params`. When a
        `build_override` is supplied (parallel.ba_sharded: shard_map'd
        observation-parallel assembly + psum'd Schur blocks), it replaces the
        single-device `build` — the LM accept/reject schedule, damping, and
        back-substitution above run replicated and are identical either way."""
        prob = problem._replace(poses=params[0], rho=params[1], theta=params[2])
        builder = build_override if build_override is not None else build
        Hcc, bc, Wr, Hr, br, Wt, Ht, bt, cost = builder(prob)
        zW = jnp.zeros((1,))
        sys = (
            Hcc, bc,
            Wr if Wr is not None else zW,
            Hr if Hr is not None else zW,
            br if br is not None else zW,
            Wt if Wt is not None else zW,
            Ht if Ht is not None else zW,
            bt if bt is not None else zW,
        )
        return sys, cost

    params0 = (problem.poses, problem.rho, problem.theta)
    # initial carry: infinite best cost so the first iteration's build of the
    # initial params always "accepts" and becomes the first linearization
    zsys, _ = build_sys(problem, params0)
    zsys = jax.tree.map(jnp.zeros_like, zsys)
    carry0 = (params0, jnp.float32(jnp.inf), zsys, params0, jnp.float32(lam0))
    carry, _ = jax.lax.scan(step, carry0, None, length=n_iters + 1)
    best_params, best_cost, _, _, lam = carry
    return LMState(
        poses=best_params[0], rho=best_params[1], theta=best_params[2],
        lam=lam, cost=best_cost,
    )


def scene_chi2(problem: BAProblem, huber: float):
    """Post-solve per-observation chi2 for outlier gating
    (src/optimizer.cc:1238-1303 semantics: evaluate, threshold, mark bad)."""
    ts = scene_terms(problem, huber)
    return ts["chi2"], ts["w"] > 0


@functools.partial(jax.jit, static_argnames=("huber", "pair_feat"))
def text_chi2(problem: BAProblem, huber: float, pair_feat: int = 0):
    tt = text_terms(problem, huber, pair_feat)
    return tt["chi2"], tt["w"] > 0


def text_region_coverage(problem: BAProblem, pair_feat: int):
    """Debug counter for the grouped sampler's silent coverage loss.

    The TPU grouped path (_sample_text_values) drops samples that are inside
    the image but outside the group's aligned region window; the per-feature
    fallback keeps them. Returns (n_dropped, n_in_image): samples the region
    window loses vs the exact per-feature gather. Call it from tests or a
    profiling pass when a sequence has unusually large close-range text boxes
    (coverage loss scales with projected box size)."""
    t = problem.text
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[t.tgt]
    host_pose = _gather_pose(poses_ext, t.host, t.host_frozen_pose, t.host_in_window[:, None])
    theta = problem.theta[t.text]
    fxl, fyl, cxl, cyl = _text_level_K(problem, t.level)
    A = se3.compose(tgt_pose, se3.inverse(host_pose))
    rho = -(t.rays * theta[:, None, :]).sum(-1)
    p_h = t.rays / rho[..., None]
    p_c = se3.apply(A[:, None, :], p_h)
    uv = project(p_c, fxl, fyl, cxl, cyl)
    _, mask_grouped = _sample_text_values(problem.images, t.tgt, uv, pair_feat)
    _, mask_exact = patch_bilinear_stack(problem.images, t.tgt, uv[:, 0], uv)
    live = t.valid[:, None] & (p_c[..., 2] > 1e-4) & (rho > 1e-6)
    dropped = (mask_exact & ~mask_grouped & live).sum()
    return int(dropped), int((mask_exact & live).sum())


@functools.partial(jax.jit, static_argnames=("pair_feat",))
def text_sample_errors(problem: BAProblem, pair_feat: int = 0):
    """Per-sample |(I - mu)/sigma - ref| and validity for the text batch.

    The post-solve per-feature gate (src/optimizer.cc:1259-1303) compares
    each of the 8 UNWEIGHTED normalized-intensity errors (FinalResidual /
    weight_T) against chi2Text[level]; returns (|err| [O, 8], ok [O, 8])."""
    t = problem.text
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[t.tgt]
    host_pose = _gather_pose(poses_ext, t.host, t.host_frozen_pose, t.host_in_window[:, None])
    theta = problem.theta[t.text]
    fxl, fyl, cxl, cyl = _text_level_K(problem, t.level)
    A = se3.compose(tgt_pose, se3.inverse(host_pose))
    rho = -(t.rays * theta[:, None, :]).sum(-1)
    p_h = t.rays / rho[..., None]
    p_c = se3.apply(A[:, None, :], p_h)
    uv = project(p_c, fxl, fyl, cxl, cyl)
    vals, mask = _sample_text_values(problem.images, t.tgt, uv, pair_feat)
    I = vals[..., 0]
    r = (I - t.mu_sigma[:, 0:1]) / t.mu_sigma[:, 1:2] - t.ref_inten
    sample_ok = mask & (p_c[..., 2] > 1e-4) & (rho > 1e-6) & t.valid[:, None]
    return jnp.abs(jnp.where(sample_ok, r, 0.0)), sample_ok
