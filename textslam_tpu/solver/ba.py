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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import project
from ..ops.interp import bilinear

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
    """Residuals + tangent Jacobians for all scene observations.

    Returns dict with per-obs r [O,2], J_t [O,2,6], J_h [O,2,6], J_l [O,2,1],
    w [O] (validity x huber x weight), cost [O] (robust, squared)."""
    s = problem.scene
    K = problem.poses.shape[0]
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
    r = r * s.weight[:, None]
    J_t = J_t * s.weight[:, None, None]
    J_h = J_h * s.weight[:, None, None]
    J_l = J_l[..., None] * s.weight[:, None, None]
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


def _text_residual(delta_tgt, delta_host, dtheta, rays, ref, mu_sigma, tgt_pose, host_pose, theta, img, fx, fy, cx, cy):
    """8-dim photometric residual (include/nume_BAText.h:22-100 semantics):
    project each pattern ray via the plane, sample target intensity, compare
    normalized values: r_k = (I_k - mu)/sigma - ref_k."""
    T_t = se3.retract(tgt_pose, delta_tgt)
    T_h = se3.retract(host_pose, delta_host)
    th = theta + dtheta
    rho = -(rays * th).sum(-1)  # [8]
    p_h = rays / rho[:, None]
    T_th = se3.compose(T_t, se3.inverse(T_h))
    p_c = se3.apply(T_th, p_h)
    uv = project(p_c, fx, fy, cx, cy)
    I, mask = bilinear(img, uv)
    mu, sigma = mu_sigma[0], mu_sigma[1]
    r = (I - mu) / sigma - ref
    return r, (mask & (p_c[..., 2] > 1e-4) & (rho > 1e-6))


def text_terms(problem: BAProblem, huber: float):
    """Residuals + tangent Jacobians for all text observations at one level."""
    t = problem.text
    K = problem.poses.shape[0]
    poses_ext = jnp.concatenate([problem.poses, se3.identity((1,))], axis=0)
    tgt_pose = poses_ext[t.tgt]
    host_pose = _gather_pose(poses_ext, t.host, t.host_frozen_pose, t.host_in_window[:, None])
    theta = problem.theta[t.text]
    imgs = problem.images

    def res(dt, dh, dth, rays, ref, ms, tp, hp, th, img):
        r, _ = _text_residual(dt, dh, dth, rays, ref, ms, tp, hp, th, img, problem.fx, problem.fy, problem.cx, problem.cy)
        return r

    zeros6 = jnp.zeros(6)
    zeros3 = jnp.zeros(3)
    jac = jax.vmap(
        lambda rays, ref, ms, tp, hp, th, tgt_i: jax.jacfwd(res, argnums=(0, 1, 2))(
            zeros6, zeros6, zeros3, rays, ref, ms, tp, hp, th, imgs[tgt_i]
        )
    )
    J_t, J_h, J_l = jac(t.rays, t.ref_inten, t.mu_sigma, tgt_pose, host_pose, theta, t.tgt)
    r, sample_ok = jax.vmap(
        lambda rays, ref, ms, tp, hp, th, tgt_i: _text_residual(
            zeros6, zeros6, zeros3, rays, ref, ms, tp, hp, th, imgs[tgt_i],
            problem.fx, problem.fy, problem.cx, problem.cy,
        )
    )(t.rays, t.ref_inten, t.mu_sigma, tgt_pose, host_pose, theta, t.tgt)
    w_row = t.weight[:, None] * sample_ok  # per-sample gating inside the 8-vector
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


def _pose_indices(slot, K):
    """Row indices of a pose block in the extended [6(K+1)] system (slot K =
    dump block for frozen poses)."""
    return slot[:, None] * 6 + jnp.arange(6)[None, :]


def assemble_camera_system(terms, tgt, host, K):
    """Scatter-add one family's camera-side normal equations.

    Returns (Hcc [6K+6, 6K+6], bc [6K+6]) in the extended system."""
    J = jnp.concatenate([terms["J_t"], terms["J_h"]], axis=-1)  # [O, R, 12]
    w = terms["w"][:, None, None]
    Jw = J * w
    H_blocks = jnp.einsum("ori,orj->oij", Jw, J)  # [O, 12, 12]
    b_blocks = jnp.einsum("ori,or->oi", Jw, terms["r"])  # [O, 12]
    idx = jnp.concatenate([_pose_indices(tgt, K), _pose_indices(host, K)], axis=-1)  # [O, 12]
    n = 6 * (K + 1)
    Hcc = jnp.zeros((n, n)).at[idx[:, :, None], idx[:, None, :]].add(H_blocks)
    bc = jnp.zeros((n,)).at[idx].add(b_blocks)
    return Hcc, bc


def assemble_landmark_system(terms, tgt, host, lm_idx, n_landmarks, K, lm_dim):
    """Per-landmark blocks: W [P, 6K+6, D], Hll [P, D, D], bl [P, D]."""
    J = jnp.concatenate([terms["J_t"], terms["J_h"]], axis=-1)  # [O, R, 12]
    Jl = terms["J_l"]  # [O, R, D]
    w = terms["w"][:, None, None]
    Jlw = Jl * w
    Hll_o = jnp.einsum("ori,orj->oij", Jlw, Jl)  # [O, D, D]
    bl_o = jnp.einsum("ori,or->oi", Jlw, terms["r"])
    W_o = jnp.einsum("ori,orj->oij", J * w, Jl)  # [O, 12, D]
    idx = jnp.concatenate([_pose_indices(tgt, K), _pose_indices(host, K)], axis=-1)
    n = 6 * (K + 1)
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


def _total_cost(problem: BAProblem, hubers) -> jnp.ndarray:
    c = jnp.float32(0.0)
    if problem.scene is not None:
        c = c + scene_terms(problem, hubers["scene"])["cost"].sum()
    if problem.text is not None:
        c = c + text_terms(problem, hubers["text"])["cost"].sum()
    return c


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "huber_scene", "huber_text", "lam0", "lam_up", "lam_down"),
)
def solve_ba(
    problem: BAProblem,
    n_iters: int = 10,
    huber_scene: float = 2.447,
    huber_text: float = 3.0,
    lam0: float = 1e-4,
    lam_up: float = 10.0,
    lam_down: float = 0.1,
):
    """Damped LM loop (fixed iteration count, accept/reject inside).

    Mirrors Ceres TRUST_REGION/LM semantics closely enough for parity: the
    reference runs `its` iterations per pyramid level with Huber losses and
    fixed blocks (src/optimizer.cc:1598-1607)."""
    K = problem.poses.shape[0]
    P = problem.rho.shape[0]
    T = problem.theta.shape[0]
    n = 6 * (K + 1)
    hubers = {"scene": huber_scene, "text": huber_text}

    free_mask = jnp.concatenate(
        [jnp.repeat(problem.pose_free, 6), jnp.zeros(6, dtype=bool)]
    )

    def build(problem):
        Hcc = jnp.zeros((n, n))
        bc = jnp.zeros((n,))
        Wr = jnp.zeros((P, n, 1))
        Hr = jnp.zeros((P, 1, 1))
        br = jnp.zeros((P, 1))
        Wt = jnp.zeros((T, n, 3))
        Ht = jnp.zeros((T, 3, 3))
        bt = jnp.zeros((T, 3))
        cost = jnp.float32(0.0)
        if problem.scene is not None:
            ts = scene_terms(problem, huber_scene)
            H1, b1 = assemble_camera_system(ts, problem.scene.tgt, problem.scene.host, K)
            W1, Hl1, bl1 = assemble_landmark_system(
                ts, problem.scene.tgt, problem.scene.host, problem.scene.point, P, K, 1
            )
            Hcc += H1
            bc += b1
            Wr += W1
            Hr += Hl1
            br += bl1
            cost += ts["cost"].sum()
        if problem.text is not None:
            tt = text_terms(problem, huber_text)
            H2, b2 = assemble_camera_system(tt, problem.text.tgt, problem.text.host, K)
            W2, Hl2, bl2 = assemble_landmark_system(
                tt, problem.text.tgt, problem.text.host, problem.text.text, T, K, 3
            )
            Hcc += H2
            bc += b2
            Wt += W2
            Ht += Hl2
            bt += bl2
            cost += tt["cost"].sum()
        return Hcc, bc, Wr, Hr, br, Wt, Ht, bt, cost

    def step(state: LMState):
        prob = problem._replace(poses=state.poses, rho=state.rho, theta=state.theta)
        Hcc, bc, Wr, Hr, br, Wt, Ht, bt, cost = build(prob)

        lam = state.lam
        # damp landmark blocks (Hll + lam*diag)
        Hr_d = Hr + lam * Hr * jnp.eye(1) + 1e-8 * jnp.eye(1)
        Ht_d = Ht + lam * Ht * jnp.eye(3) + 1e-8 * jnp.eye(3)
        Hr_inv = 1.0 / Hr_d[:, 0, 0]
        Hr_inv = jnp.where(Hr[:, 0, 0] > 1e-12, Hr_inv, 0.0)
        Ht_inv = jnp.linalg.pinv(Ht_d) * (jnp.trace(Ht, axis1=-2, axis2=-1) > 1e-12)[:, None, None]

        # Schur complement
        H_red = (
            Hcc
            - jnp.einsum("pid,p,pjd->ij", Wr, Hr_inv, Wr)
            - jnp.einsum("pid,pde,pje->ij", Wt, Ht_inv, Wt)
        )
        b_red = (
            bc
            - jnp.einsum("pid,p,pd->i", Wr, Hr_inv, br)
            - jnp.einsum("pid,pde,pe->i", Wt, Ht_inv, bt)
        )
        # damp + freeze + Jacobi scale
        diag = jnp.diagonal(H_red)
        diag_safe = jnp.where(free_mask & (diag > 1e-12), diag, 1.0)
        Dinv = 1.0 / jnp.sqrt(diag_safe)
        Hs = H_red * Dinv[:, None] * Dinv[None, :]
        Hs = jnp.where(free_mask[:, None] & free_mask[None, :], Hs, 0.0)
        Hs = Hs + (lam + 1e-8) * jnp.eye(n) + jnp.diag(~free_mask * 1.0)
        bs = jnp.where(free_mask, b_red * Dinv, 0.0)
        delta_s = jnp.linalg.solve(Hs, -bs)
        delta_c = delta_s * Dinv * free_mask

        # back-substitute landmarks
        drho = Hr_inv * (-br[:, 0] - jnp.einsum("pid,i->pd", Wr, delta_c)[:, 0])
        dtheta = jnp.einsum(
            "pde,pe->pd", Ht_inv, -bt - jnp.einsum("pid,i->pd", Wt, delta_c)
        )

        new_poses, new_rho, new_theta = _apply_update(prob, delta_c, drho, dtheta)
        new_prob = problem._replace(poses=new_poses, rho=new_rho, theta=new_theta)
        new_cost = _total_cost(new_prob, hubers)
        finite = jnp.isfinite(new_cost) & jnp.isfinite(new_poses).all() & jnp.isfinite(new_rho).all() & jnp.isfinite(new_theta).all()
        accept = (new_cost < cost) & finite
        return LMState(
            poses=jnp.where(accept, new_poses, state.poses),
            rho=jnp.where(accept, new_rho, state.rho),
            theta=jnp.where(accept, new_theta, state.theta),
            lam=jnp.clip(jnp.where(accept, lam * lam_down, lam * lam_up), 1e-10, 1e8),
            cost=jnp.where(accept, new_cost, cost),
        )

    init_cost = _total_cost(problem, hubers)
    state = LMState(problem.poses, problem.rho, problem.theta, jnp.float32(lam0), init_cost)
    state = jax.lax.fori_loop(0, n_iters, lambda i, s: step(s), state)
    return state


@functools.partial(jax.jit, static_argnames=("huber",))
def scene_chi2(problem: BAProblem, huber: float):
    """Post-solve per-observation chi2 for outlier gating
    (src/optimizer.cc:1238-1303 semantics: evaluate, threshold, mark bad)."""
    ts = scene_terms(problem, huber)
    return ts["chi2"], ts["w"] > 0


@functools.partial(jax.jit, static_argnames=("huber",))
def text_chi2(problem: BAProblem, huber: float):
    tt = text_terms(problem, huber)
    return tt["chi2"], tt["w"] > 0
