"""Sim3 estimation and pose-graph optimization.

Covers the reference's loop-closing solvers:
- Sim3Solver RANSAC (src/Sim3Solver.cc:59-221): Horn closed form on 3-point
  sets with symmetric reprojection inlier checks — batched: every hypothesis
  solved in one einsum pass.
- OptimizeSim3 (src/optimizer.cc:626-732, functors auto_sim/auto_siminv):
  GN refinement of S12 on its 7-dof tangent with Huber, plus inlier recount.
- OptimizeLoop (src/optimizer.cc:734-957, functor numer_loop_ver2): Sim3
  pose-graph over normal + loop edges, residual logSim3(S_meas ∘ Sa ∘ Sb^-1),
  dense GN (pose graphs here are <= a few hundred nodes — replicate, don't
  shard; SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3
from ..geometry.camera import project


# ---------------------------------------------------------------------------
# RANSAC


@functools.partial(jax.jit, static_argnames=("n_sets",))
def sim3_ransac(
    key,
    P1,
    P2,
    uv1,
    uv2,
    valid,
    fx, fy, cx, cy,
    err2_thresh: float = 45.0,
    n_sets: int = 200,
    fix_scale: bool = False,
):
    """Batched Horn RANSAC for S12 with symmetric reprojection gating.

    P1 [N, 3] camera-1-frame points matched to P2 [N, 3] camera-2-frame
    points; uv1/uv2 their pixel observations. Returns (S12 [8], inliers [N],
    n_inliers)."""
    N = P1.shape[0]
    g = jax.random.gumbel(key, (n_sets, N))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 3)
    S = sim3.horn_alignment(P1[idx], P2[idx], fix_scale=fix_scale)  # [S, 8]

    def inlier_count(S12):
        p1 = sim3.apply(S12[None, :], P2)  # P2 -> cam1
        p2 = sim3.apply(sim3.inverse(S12)[None, :], P1)
        e1 = ((project(p1, fx, fy, cx, cy) - uv1) ** 2).sum(-1)
        e2 = ((project(p2, fx, fy, cx, cy) - uv2) ** 2).sum(-1)
        inl = (e1 < err2_thresh) & (e2 < err2_thresh) & (p1[:, 2] > 0) & (p2[:, 2] > 0) & valid
        return inl

    inls = jax.vmap(inlier_count)(S)  # [S, N]
    votes = inls.sum(-1)
    best = jnp.argmax(votes)
    S_best = S[best]
    # refit on inliers
    w = inls[best].astype(P1.dtype)
    S_ref = sim3.horn_alignment(P1, P2, w=w, fix_scale=fix_scale)
    inl = inlier_count(S_ref)
    S_out = jnp.where(inl.sum() >= votes[best], S_ref, S_best)
    inl_out = inlier_count(S_out)
    return S_out, inl_out, inl_out.sum()


# ---------------------------------------------------------------------------
# Sim3 refinement (OptimizeSim3)


@functools.partial(jax.jit, static_argnames=("n_iters",))
def refine_sim3(
    S12_init,
    P1, P2, uv1, uv2, valid,
    fx, fy, cx, cy,
    huber: float = 3.162,  # sqrt(10), src/optimizer.cc:663
    n_iters: int = 20,
    err_thresh: float = 4.0,  # px, post-refine inlier gate (:706-729)
    fix_scale: bool = False,
):
    """GN/LM refinement of S12 on the sim3 tangent; returns (S12, inliers)."""

    def residuals(S12):
        p1 = sim3.apply(S12[None, :], P2)
        p2 = sim3.apply(sim3.inverse(S12)[None, :], P1)
        r1 = project(p1, fx, fy, cx, cy) - uv1
        r2 = project(p2, fx, fy, cx, cy) - uv2
        ok = valid & (p1[:, 2] > 1e-4) & (p2[:, 2] > 1e-4)
        return jnp.concatenate([r1, r2], axis=-1), ok  # [N, 4]

    def cost_of(S12):
        r, ok = residuals(S12)
        r2 = (r * r).sum(-1)
        rn = jnp.sqrt(r2.clip(1e-12))
        c = jnp.where(rn <= huber, r2, 2 * huber * rn - huber * huber)
        return jnp.where(ok, c, 0.0).sum()

    def step(carry, _):
        S12, lam, cost = carry

        def res_tangent(delta):
            S = sim3.compose(sim3.expm(delta), S12)
            r, ok = residuals(S)
            r2 = (r * r).sum(-1)
            hw = jnp.where(jnp.sqrt(r2.clip(1e-12)) <= huber, 1.0,
                           jnp.sqrt(huber / jnp.sqrt(r2.clip(1e-12))))
            # IRLS: the robust weight is frozen at the linearization point —
            # differentiating through |r|^-1/2 halves the Jacobian of large
            # residuals and makes GN overshoot 2x
            w = jax.lax.stop_gradient(jnp.where(ok, hw, 0.0))
            return (r * w[:, None]).reshape(-1)

        z = jnp.zeros(7)
        if True:
            J = jax.jacfwd(res_tangent)(z)  # [4N, 7]
            r = res_tangent(z)
        J = jnp.where(jnp.isfinite(J), J, 0.0)
        r = jnp.where(jnp.isfinite(r), r, 0.0)
        H = J.T @ J
        b = J.T @ r
        scale_mask = jnp.ones(7).at[6].set(0.0 if fix_scale else 1.0)
        H = H + (lam * jnp.diagonal(H) + 1e-8) * jnp.eye(7)
        H = H + jnp.diag((1.0 - scale_mask) * 1e6)
        delta = jnp.linalg.solve(H, -b) * scale_mask
        S_new = sim3.compose(sim3.expm(delta), S12)
        new_cost = cost_of(S_new)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        S12 = jnp.where(accept, S_new, S12)
        return (
            S12,
            jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e8),
            jnp.where(accept, new_cost, cost),
        ), None

    init = (S12_init, jnp.float32(1e-4), cost_of(S12_init))
    (S12, _, _), _ = jax.lax.scan(step, init, None, length=n_iters)
    r, ok = residuals(S12)
    e1 = (r[:, :2] ** 2).sum(-1)
    e2 = (r[:, 2:] ** 2).sum(-1)
    inl = ok & (e1 < err_thresh**2) & (e2 < err_thresh**2)
    return S12, inl


# ---------------------------------------------------------------------------
# Sim3 pose graph (OptimizeLoop)


class PoseGraph(NamedTuple):
    nodes: jnp.ndarray  # [N, 8] Sim3 S_iw
    fixed: jnp.ndarray  # [N] bool
    edge_a: jnp.ndarray  # [E] int32
    edge_b: jnp.ndarray  # [E] int32
    edge_meas: jnp.ndarray  # [E, 8] S_ba measurements (maps a-frame -> b-frame)
    edge_valid: jnp.ndarray  # [E] bool
    edge_weight: jnp.ndarray  # [E]


@functools.partial(jax.jit, static_argnames=("n_iters",))
def solve_pose_graph(graph: PoseGraph, n_iters: int = 20, lam0: float = 1e-6):
    """Dense GN over Sim3 nodes. Residual per edge:
    r = logSim3(S_ba_meas ∘ S_aw ∘ S_bw^-1)  (numer_loop_ver2 semantics)."""
    N = graph.nodes.shape[0]
    E = graph.edge_a.shape[0]

    def edge_residual(delta_a, delta_b, Sa, Sb, meas):
        Sa = sim3.compose(sim3.expm(delta_a), Sa)
        Sb = sim3.compose(sim3.expm(delta_b), Sb)
        return sim3.logm(sim3.compose(meas, sim3.compose(Sa, sim3.inverse(Sb))))

    def build(nodes):
        Sa = nodes[graph.edge_a]
        Sb = nodes[graph.edge_b]
        z = jnp.zeros(7)
        Ja, Jb = jax.vmap(
            lambda sa, sb, m: jax.jacfwd(edge_residual, argnums=(0, 1))(z, z, sa, sb, m)
        )(Sa, Sb, graph.edge_meas)
        r = jax.vmap(lambda sa, sb, m: edge_residual(z, z, sa, sb, m))(Sa, Sb, graph.edge_meas)
        w = (graph.edge_valid * graph.edge_weight)[:, None]
        r = jnp.where(jnp.isfinite(r), r, 0.0) * w
        Ja = jnp.where(jnp.isfinite(Ja), Ja, 0.0) * w[..., None]
        Jb = jnp.where(jnp.isfinite(Jb), Jb, 0.0) * w[..., None]
        return r, Ja, Jb

    free = ~graph.fixed

    def step(carry, _):
        nodes, lam, cost = carry
        r, Ja, Jb = build(nodes)
        n = 7 * N
        # assemble dense H via scatter-add of the four blocks
        ia = graph.edge_a[:, None] * 7 + jnp.arange(7)[None, :]
        ib = graph.edge_b[:, None] * 7 + jnp.arange(7)[None, :]
        H = jnp.zeros((n, n))
        b = jnp.zeros((n,))
        Haa = jnp.einsum("eri,erj->eij", Ja, Ja)
        Hbb = jnp.einsum("eri,erj->eij", Jb, Jb)
        Hab = jnp.einsum("eri,erj->eij", Ja, Jb)
        H = H.at[ia[:, :, None], ia[:, None, :]].add(Haa)
        H = H.at[ib[:, :, None], ib[:, None, :]].add(Hbb)
        H = H.at[ia[:, :, None], ib[:, None, :]].add(Hab)
        H = H.at[ib[:, :, None], ia[:, None, :]].add(jnp.swapaxes(Hab, -1, -2))
        b = b.at[ia].add(jnp.einsum("eri,er->ei", Ja, r))
        b = b.at[ib].add(jnp.einsum("eri,er->ei", Jb, r))

        free_mask = jnp.repeat(free, 7)
        diag = jnp.diagonal(H)
        H = jnp.where(free_mask[:, None] & free_mask[None, :], H, 0.0)
        H = H + (lam * jnp.where(diag > 1e-12, diag, 1.0) + 1e-8) * jnp.eye(n)
        H = H + jnp.diag((~free_mask) * 1.0)
        b = jnp.where(free_mask, b, 0.0)
        delta = jnp.linalg.solve(H, -b)
        delta = (delta * free_mask).reshape(N, 7)
        new_nodes = sim3.compose(sim3.expm(delta), nodes)
        new_nodes = jnp.where(graph.fixed[:, None], nodes, new_nodes)
        r2, _, _ = build(new_nodes)
        new_cost = (r2 * r2).sum()
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        return (
            jnp.where(accept, new_nodes, nodes),
            jnp.clip(jnp.where(accept, lam * 0.3, lam * 10.0), 1e-12, 1e8),
            jnp.where(accept, new_cost, cost),
        ), None

    r0, _, _ = build(graph.nodes)
    cost0 = (r0 * r0).sum()
    (nodes, _, cost), _ = jax.lax.scan(step, (graph.nodes, jnp.float32(lam0), cost0), None, length=n_iters)
    return nodes, cost
