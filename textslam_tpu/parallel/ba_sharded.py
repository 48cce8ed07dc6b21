"""Distributed bundle adjustment over a device mesh.

SURVEY.md §2.4 mapping: the reference is single-threaded (Ceres num_threads=1,
src/optimizer.cc:1600); here the residual/Jacobian evaluation and
normal-equation assembly — the O(observations) work — shard across devices
with `shard_map`, and the reduced camera system (6K x 6K, tiny) is formed by
`psum` over the mesh, the direct analog of the reference's serial Schur
accumulation. Landmark blocks (W, Hll, bl) are dense per-landmark arrays and
psum the same way; the back-substitution and the small dense solve run
replicated on every device (cheaper than gathering to one chip).

Collectives ride ICI within a slice; with `jax.distributed` + a multi-host
mesh the same code spans DCN (no code change — XLA lowers the psum).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry import se3
from ..solver import ba


def _text_obs_spec(axis: str) -> ba.TextObs:
    """Shard every TextObs array field along `axis`; `level` (a static int
    riding in the NamedTuple) replicates. Built by field name so reordering
    or appending fields cannot silently mis-shard anything."""
    specs = {f: P(axis) for f in ba.TextObs._fields}
    specs["level"] = P()
    return ba.TextObs(**specs)


def _scene_obs_spec(axis: str) -> ba.SceneObs:
    return ba.SceneObs(**{f: P(axis) for f in ba.SceneObs._fields})


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_obs_to_shards(scene: ba.SceneObs, n_shards: int) -> ba.SceneObs:
    """Pad the observation batch so its length divides the mesh size."""
    O = scene.tgt.shape[0]
    Opad = ((O + n_shards - 1) // n_shards) * n_shards
    if Opad == O:
        return scene

    def fix(x, fill=0):
        pad = [(0, Opad - O)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    hp = fix(scene.host_frozen_pose)
    hp = hp.at[O:, 0].set(1.0)
    return ba.SceneObs(
        tgt=fix(scene.tgt), host=fix(scene.host), host_frozen_pose=hp,
        host_in_window=fix(scene.host_in_window, False), point=fix(scene.point),
        ray=fix(scene.ray), uv=fix(scene.uv), weight=fix(scene.weight),
        valid=fix(scene.valid, False),
    )


def sharded_scene_normal_eqs(problem: ba.BAProblem, mesh: Mesh, huber: float):
    """Scene-family normal equations with observation-parallel assembly.

    Observations shard along the mesh's data axis; poses/rho replicate.
    Returns replicated (Hcc [n, n], bc [n], W [P, n, 1], Hll [P, 1, 1],
    bl [P, 1], cost)."""
    K = problem.poses.shape[0]
    Pn = problem.rho.shape[0]
    axis = mesh.axis_names[0]
    scene = pad_obs_to_shards(problem.scene, mesh.devices.size)

    obs_spec = _scene_obs_spec(axis)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(obs_spec, P(), P(), P()),
        out_specs=P(),
    )
    def assemble(scene_shard, poses, rho, rho_free):
        prob = problem._replace(
            poses=poses, rho=rho, rho_free=rho_free, scene=scene_shard
        )
        ts = ba.scene_terms(prob, huber)
        Hcc, bc = ba.assemble_camera_system(ts, scene_shard.tgt, scene_shard.host, K)
        W, Hll, bl = ba.assemble_landmark_system(
            ts, scene_shard.tgt, scene_shard.host, scene_shard.point, Pn, K, 1
        )
        cost = ts["cost"].sum()
        return (
            jax.lax.psum(Hcc, axis),
            jax.lax.psum(bc, axis),
            jax.lax.psum(W, axis),
            jax.lax.psum(Hll, axis),
            jax.lax.psum(bl, axis),
            jax.lax.psum(cost, axis),
        )

    return assemble(scene, problem.poses, problem.rho, problem.rho_free)


def partition_scene_by_landmark(scene: ba.SceneObs, rho: jnp.ndarray,
                                rho_free: jnp.ndarray, n_shards: int):
    """Host-side prep for landmark-sharded BA: assign landmarks to shards in
    contiguous blocks, route every observation to its landmark's shard, and
    rebase point ids to shard-local indices.

    Returns (scene_routed, rho_padded, rho_free_padded, P_local): observation
    arrays of length n_shards*O_max (shard s owns rows [s*O_max, (s+1)*O_max))
    and landmark arrays of length n_shards*P_local."""
    P = rho.shape[0]
    P_local = (P + n_shards - 1) // n_shards
    pt = np.asarray(scene.point)
    shard_of_obs = np.minimum(pt // P_local, n_shards - 1)
    O_max = int(np.bincount(shard_of_obs, minlength=n_shards).max())
    O_max = max(O_max, 1)

    order = np.argsort(shard_of_obs, kind="stable")
    routed = {f: np.asarray(getattr(scene, f)) for f in scene._fields if f != "point"}
    out = {}
    for f, a in routed.items():
        buf = np.zeros((n_shards * O_max,) + a.shape[1:], a.dtype)
        if f == "host_frozen_pose":
            buf[:, 0] = 1.0
        out[f] = buf
    point_local = np.zeros(n_shards * O_max, np.int32)
    pos = 0
    for s in range(n_shards):
        rows = order[shard_of_obs[order] == s]
        n = len(rows)
        for f, a in routed.items():
            out[f][s * O_max: s * O_max + n] = a[rows]
        out["valid"][s * O_max + n: (s + 1) * O_max] = False
        point_local[s * O_max: s * O_max + n] = pt[rows] - s * P_local
        pos += n
    scene_routed = ba.SceneObs(point=jnp.asarray(point_local),
                               **{f: jnp.asarray(v) for f, v in out.items()})
    rho_p = jnp.pad(rho, (0, n_shards * P_local - P))
    rf_p = jnp.pad(rho_free, (0, n_shards * P_local - P), constant_values=False)
    return scene_routed, rho_p, rf_p, P_local


@functools.partial(jax.jit, static_argnames=("mesh", "P_local", "huber", "lam"))
def _landmark_sharded_step(scene, rho_p, rf_p, poses, pose_free, P_local: int,
                           mesh: Mesh, huber: float, lam: float,
                           fx, fy, cx, cy):
    """One damped GN step with LANDMARK-sharded Schur elimination.

    Each shard owns a block of landmarks and ALL their observations, so the
    per-landmark arrays (W [P_loc, n, 1], Hll, bl) never cross the wire: only
    the [n, n] reduced camera system psums (communication O(K^2) per step vs
    O(P*K) for the observation-sharded path — the scaling-book recipe of
    keeping the big axis local and reducing the small one). The solve is
    replicated; landmark back-substitution is shard-local, so rho updates
    come back still sharded."""
    K = poses.shape[0]
    n = 6 * (K + 1)
    axis = mesh.axis_names[0]
    free_mask = jnp.concatenate([jnp.repeat(pose_free, 6), jnp.zeros(6, dtype=bool)])

    obs_spec = _scene_obs_spec(axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(obs_spec, P(axis), P(axis), P(), P()),
        out_specs=(P(), P(axis), P()),
    )
    def step(scene_l, rho_l, rf_l, poses_r, pose_free_r):
        prob = ba.BAProblem(
            poses=poses_r, pose_free=pose_free_r, rho=rho_l, rho_free=rf_l,
            theta=jnp.zeros((1, 3)), theta_free=jnp.zeros(1, dtype=bool),
            scene=scene_l, text=None, images=None,
            fx=fx, fy=fy, cx=cx, cy=cy,
        )
        ts = ba.scene_terms(prob, huber)
        Hcc, bc = ba.assemble_camera_system(ts, scene_l.tgt, scene_l.host, K)
        W, Hll, bl = ba.assemble_landmark_system(
            ts, scene_l.tgt, scene_l.host, scene_l.point, P_local, K, 1
        )
        # local Schur contribution; only [n, n] + [n] cross the wire
        Hr_d = Hll[:, 0, 0] * (1.0 + lam) + 1e-8
        Hr_inv = jnp.where(Hll[:, 0, 0] > 1e-12, 1.0 / Hr_d, 0.0)
        H_red = jax.lax.psum(Hcc - jnp.einsum("pid,p,pjd->ij", W, Hr_inv, W), axis)
        b_red = jax.lax.psum(bc - jnp.einsum("pid,p,pd->i", W, Hr_inv, bl), axis)
        cost = jax.lax.psum(ts["cost"].sum(), axis)

        diag = jnp.diagonal(H_red)
        diag_safe = jnp.where(free_mask & (diag > 1e-12), diag, 1.0)
        Dinv = 1.0 / jnp.sqrt(diag_safe)
        Hs = H_red * Dinv[:, None] * Dinv[None, :]
        Hs = jnp.where(free_mask[:, None] & free_mask[None, :], Hs, 0.0)
        Hs = Hs + (lam + 1e-8) * jnp.eye(n) + jnp.diag(~free_mask * 1.0)
        bs = jnp.where(free_mask, b_red * Dinv, 0.0)
        delta_c = jnp.linalg.solve(Hs, -bs) * Dinv * free_mask
        # shard-local back-substitution
        drho = Hr_inv * (-bl[:, 0] - jnp.einsum("pid,i->pd", W, delta_c)[:, 0])
        d = delta_c[: 6 * K].reshape(K, 6) * pose_free_r[:, None]
        new_poses = jnp.where(pose_free_r[:, None], se3.retract(poses_r, d), poses_r)
        return new_poses, rho_l + drho * rf_l, cost

    return step(scene, rho_p, rf_p, poses, pose_free)


def sharded_ba_step_landmark(problem: ba.BAProblem, mesh: Mesh,
                             huber: float = 2.447, lam: float = 1e-4):
    """Landmark-sharded GN step (host routing + device step). Returns
    (poses, rho [P], cost) with rho gathered back to the original length."""
    n_shards = mesh.devices.size
    scene, rho_p, rf_p, P_local = partition_scene_by_landmark(
        problem.scene, problem.rho, problem.rho_free, n_shards
    )
    poses, rho_sh, cost = _landmark_sharded_step(
        scene, rho_p, rf_p, problem.poses, problem.pose_free, P_local, mesh,
        huber, lam, problem.fx, problem.fy, problem.cx, problem.cy,
    )
    return poses, rho_sh[: problem.rho.shape[0]], cost


def pad_text_to_shards(text: ba.TextObs, n_shards: int) -> ba.TextObs:
    """Pad the text observation batch so its length divides the mesh size."""
    O = text.tgt.shape[0]
    Opad = ((O + n_shards - 1) // n_shards) * n_shards
    if Opad == O:
        return text

    def fix(x, fill=0):
        pad = [(0, Opad - O)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    hp = fix(text.host_frozen_pose)
    hp = hp.at[O:, 0].set(1.0)
    ms = fix(text.mu_sigma)
    ms = ms.at[O:, 1].set(1.0)
    return ba.TextObs(
        tgt=fix(text.tgt), host=fix(text.host), host_frozen_pose=hp,
        host_in_window=fix(text.host_in_window, False), text=fix(text.text),
        rays=fix(text.rays), ref_inten=fix(text.ref_inten), mu_sigma=ms,
        weight=fix(text.weight), valid=fix(text.valid, False),
        level=text.level,
    )


def sharded_text_normal_eqs(problem: ba.BAProblem, mesh: Mesh, huber: float):
    """Text-family normal equations with observation-parallel assembly.

    Photometric observations shard along the data axis; poses/theta and the
    target image stack replicate (the window pyramids are the working set
    every shard samples from — SURVEY.md §7.3.2). Returns replicated
    (Hcc, bc, Wt [T, n, 3], Ht [T, 3, 3], bt [T, 3], cost)."""
    K = problem.poses.shape[0]
    T = problem.theta.shape[0]
    axis = mesh.axis_names[0]
    text = pad_text_to_shards(problem.text, mesh.devices.size)

    obs_spec = _text_obs_spec(axis)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(obs_spec, P(), P(), P()),
        out_specs=P(),
    )
    def assemble(text_shard, poses, theta, images):
        prob = problem._replace(poses=poses, theta=theta, images=images,
                                text=text_shard)
        tt = ba.text_terms(prob, huber)
        Hcc, bc = ba.assemble_camera_system(tt, text_shard.tgt, text_shard.host, K)
        Wt, Ht, bt = ba.assemble_landmark_system(
            tt, text_shard.tgt, text_shard.host, text_shard.text, T, K, 3
        )
        cost = tt["cost"].sum()
        return (
            jax.lax.psum(Hcc, axis), jax.lax.psum(bc, axis),
            jax.lax.psum(Wt, axis), jax.lax.psum(Ht, axis),
            jax.lax.psum(bt, axis), jax.lax.psum(cost, axis),
        )

    return assemble(text, problem.poses, problem.theta, problem.images)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_iters", "huber_scene", "huber_text", "lam0",
                     "lam_up", "lam_down", "lam_min", "lam_max"),
)
def _solve_ba_sharded_jit(problem, mesh, n_iters, huber_scene, huber_text,
                          lam0, lam_up, lam_down, lam_min, lam_max):
    def build(prob):
        Wr = Hr = br = Wt = Ht = bt = None
        K = prob.poses.shape[0]
        n = 6 * (K + 1)
        Hcc = jnp.zeros((n, n))
        bc = jnp.zeros((n,))
        cost = jnp.float32(0.0)
        if prob.scene is not None:
            Hcc, bc, Wr, Hr, br, cost_s = sharded_scene_normal_eqs(
                prob, mesh, huber_scene)
            cost = cost + cost_s
        if prob.text is not None:
            H2, b2, Wt, Ht, bt, cost_t = sharded_text_normal_eqs(
                prob, mesh, huber_text)
            Hcc = Hcc + H2
            bc = bc + b2
            cost = cost + cost_t
        return Hcc, bc, Wr, Hr, br, Wt, Ht, bt, cost

    with jax.default_matmul_precision("highest"):
        return ba._solve_ba_body(
            problem, n_iters, huber_scene, huber_text, lam0, lam_up, lam_down,
            0, lam_min=lam_min, lam_max=lam_max, build_override=build)


def solve_ba_sharded(
    problem: ba.BAProblem,
    mesh: Mesh,
    n_iters: int = 10,
    huber_scene: float = 2.447,
    huber_text: float = 3.0,
    lam0: float = 1e-4,
    lam_up: float = 10.0,
    lam_down: float = 0.1,
    text_pair_feat: int = 0,  # accepted for API parity; grouped sampling is
    lam_min: float = 1e-12,   # single-device-only (shard cuts break groups)
    lam_max: float = 1e8,
) -> ba.LMState:
    """Full deferred-accept LM bundle adjustment over a device mesh.

    The multi-device analog of `solver.ba.solve_ba` with IDENTICAL semantics
    (same accept/reject schedule, damping, Schur elimination, gauge handling —
    src/optimizer.cc:1330-1698 PyrBA): the only difference is that residual/
    Jacobian evaluation and normal-equation assembly run observation-parallel
    under `shard_map` and the reduced Schur blocks arrive by `psum`. The LM
    control flow (lax.scan) and the small dense solve are replicated on every
    device, so poses/rho/theta stay bitwise in lockstep across shards.

    Observation batches are padded host-side to a shard multiple once, before
    the jit, so the scan does not re-pad per iteration. Text photometric rows
    use per-feature patch gathers here (the grouped Pallas region kernel
    assumes [pair, pair_feat]-contiguous rows, which shard cuts would split).
    """
    n_shards = mesh.devices.size
    scene = (pad_obs_to_shards(problem.scene, n_shards)
             if problem.scene is not None else None)
    text = (pad_text_to_shards(problem.text, n_shards)
            if problem.text is not None else None)
    problem = problem._replace(scene=scene, text=text)
    return _solve_ba_sharded_jit(problem, mesh, n_iters, huber_scene,
                                 huber_text, lam0, lam_up, lam_down,
                                 lam_min, lam_max)


@functools.partial(jax.jit, static_argnames=("mesh", "huber", "huber_text", "lam"))
def sharded_ba_step(problem: ba.BAProblem, mesh: Mesh, huber: float = 2.447,
                    huber_text: float = 3.0, lam: float = 1e-4):
    with jax.default_matmul_precision("highest"):
        return _sharded_ba_step_body(problem, mesh, huber, huber_text, lam)


def _sharded_ba_step_body(problem: ba.BAProblem, mesh: Mesh, huber: float,
                          huber_text: float, lam: float):
    """One damped GN step of (scene [+ text]) BA with sharded assembly.

    The full multi-chip 'training step': sharded residual/Jacobian eval,
    psum-reduced Schur system, replicated solve + landmark back-substitution.
    Returns (poses, rho, cost) — and updated theta via the same Schur path
    when problem.text is present (poses, rho, theta, cost)."""
    K = problem.poses.shape[0]
    n = 6 * (K + 1)
    Hcc, bc, W, Hll, bl, cost = sharded_scene_normal_eqs(problem, mesh, huber)
    with_text = problem.text is not None
    if with_text:
        H2, b2, Wt, Ht, bt, cost_t = sharded_text_normal_eqs(
            problem, mesh, huber_text)
        Hcc = Hcc + H2
        bc = bc + b2
        cost = cost + cost_t

    free_mask = jnp.concatenate([jnp.repeat(problem.pose_free, 6), jnp.zeros(6, dtype=bool)])
    Hr_d = Hll[:, 0, 0] * (1.0 + lam) + 1e-8
    Hr_inv = jnp.where(Hll[:, 0, 0] > 1e-12, 1.0 / Hr_d, 0.0)
    H_red = Hcc - jnp.einsum("pid,p,pjd->ij", W, Hr_inv, W)
    b_red = bc - jnp.einsum("pid,p,pd->i", W, Hr_inv, bl)
    if with_text:
        Ht_d = Ht + (lam * Ht + 1e-8) * jnp.eye(3)
        Ht_inv = ba.inv3x3_spd(Ht_d)
        H_red = H_red - jnp.einsum("pid,pde,pje->ij", Wt, Ht_inv, Wt)
        b_red = b_red - jnp.einsum("pid,pde,pe->i", Wt, Ht_inv, bt)
    diag = jnp.diagonal(H_red)
    diag_safe = jnp.where(free_mask & (diag > 1e-12), diag, 1.0)
    Dinv = 1.0 / jnp.sqrt(diag_safe)
    Hs = H_red * Dinv[:, None] * Dinv[None, :]
    Hs = jnp.where(free_mask[:, None] & free_mask[None, :], Hs, 0.0)
    Hs = Hs + (lam + 1e-8) * jnp.eye(n) + jnp.diag(~free_mask * 1.0)
    bs = jnp.where(free_mask, b_red * Dinv, 0.0)
    delta_c = jnp.linalg.solve(Hs, -bs) * Dinv * free_mask
    drho = Hr_inv * (-bl[:, 0] - jnp.einsum("pid,i->pd", W, delta_c)[:, 0])

    d = delta_c[: 6 * K].reshape(K, 6) * problem.pose_free[:, None]
    poses = jnp.where(problem.pose_free[:, None], se3.retract(problem.poses, d), problem.poses)
    rho = problem.rho + drho * problem.rho_free
    if with_text:
        dtheta = jnp.einsum(
            "pde,pe->pd", Ht_inv, -bt - jnp.einsum("pid,i->pd", Wt, delta_c))
        theta = problem.theta + dtheta * problem.theta_free[:, None]
        return poses, rho, theta, cost
    return poses, rho, cost
