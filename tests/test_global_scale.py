"""Large-K solver paths for the loop-time global passes (VERDICT r4 next #1).

The reference runs GlobalBA and OptimizeLandmarker over ALL keyframes after
every accepted loop (src/loopClosing.cc:587-591, src/optimizer.cc:334-453,
456-562) — hundreds of KFs on its real sequences. These tests pin:
- the segment-sum camera assembly (used when (K+1)^2 exceeds the one-hot
  bucket cap) against an independent numpy reduction and against the
  one-hot path itself;
- the no-free-poses solver fast path (camera assembly/Schur skipped) against
  the full solver on identical landmark-only problems;
- a GlobalBA-shaped solve at K=128 actually executing and converging.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textslam_tpu.solver import ba
from textslam_tpu.geometry import se3


def _rand_terms(rng, O, R=2):
    return {
        "r": jnp.asarray(rng.standard_normal((O, R)).astype(np.float32)),
        "J_t": jnp.asarray(rng.standard_normal((O, R, 6)).astype(np.float32)),
        "J_h": jnp.asarray(rng.standard_normal((O, R, 6)).astype(np.float32)),
        "J_l": jnp.asarray(rng.standard_normal((O, R, 1)).astype(np.float32)),
        "w": jnp.asarray(rng.random(O).astype(np.float32)),
    }


def _camera_system_np(terms, tgt, host, K):
    """Independent dense reference: accumulate each observation's 12x12
    block into the [6(K+1)]^2 system with explicit loops."""
    J = np.concatenate([np.asarray(terms["J_t"]), np.asarray(terms["J_h"])], axis=-1)
    w = np.asarray(terms["w"])
    r = np.asarray(terms["r"])
    n = 6 * (K + 1)
    H = np.zeros((n, n), np.float64)
    b = np.zeros(n, np.float64)
    for o in range(J.shape[0]):
        Jo = J[o].astype(np.float64)
        Ho = (Jo * w[o]).T @ Jo
        bo = (Jo * w[o]).T @ r[o].astype(np.float64)
        ti, hi = int(tgt[o]) * 6, int(host[o]) * 6
        H[ti:ti + 6, ti:ti + 6] += Ho[0:6, 0:6]
        H[ti:ti + 6, hi:hi + 6] += Ho[0:6, 6:12]
        H[hi:hi + 6, ti:ti + 6] += Ho[6:12, 0:6]
        H[hi:hi + 6, hi:hi + 6] += Ho[6:12, 6:12]
        b[ti:ti + 6] += bo[0:6]
        b[hi:hi + 6] += bo[6:12]
    return H, b


class TestCameraAssemblyPaths:
    def test_segment_path_matches_reference(self):
        # K = 70 -> Kp^2 = 5041 > ONEHOT_MAX_PAIR_BUCKETS -> segment path
        K, O = 70, 512
        assert (K + 1) ** 2 > ba.ONEHOT_MAX_PAIR_BUCKETS
        rng = np.random.default_rng(0)
        terms = _rand_terms(rng, O)
        tgt = jnp.asarray(rng.integers(0, K, O).astype(np.int32))
        host = jnp.asarray(rng.integers(0, K + 1, O).astype(np.int32))
        Hcc, bc = ba.assemble_camera_system(terms, tgt, host, K)
        H_ref, b_ref = _camera_system_np(terms, tgt, host, K)
        np.testing.assert_allclose(np.asarray(Hcc), H_ref, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(bc), b_ref, rtol=2e-4, atol=2e-3)

    def test_onehot_path_matches_reference(self):
        K, O = 20, 512
        assert (K + 1) ** 2 <= ba.ONEHOT_MAX_PAIR_BUCKETS
        rng = np.random.default_rng(1)
        terms = _rand_terms(rng, O)
        tgt = jnp.asarray(rng.integers(0, K, O).astype(np.int32))
        host = jnp.asarray(rng.integers(0, K + 1, O).astype(np.int32))
        Hcc, bc = ba.assemble_camera_system(terms, tgt, host, K)
        H_ref, b_ref = _camera_system_np(terms, tgt, host, K)
        np.testing.assert_allclose(np.asarray(Hcc), H_ref, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(bc), b_ref, rtol=2e-4, atol=2e-3)

    def test_paths_agree_at_boundary(self):
        """Same inputs through both paths (the switch is a static shape
        decision; force each by calling with K just below/above the cap
        using identical semantics on a shared sub-problem)."""
        rng = np.random.default_rng(2)
        O = 256
        terms = _rand_terms(rng, O)
        K_small = 60  # 61^2 = 3721 <= 4096 -> one-hot
        K_large = 64  # 65^2 = 4225 > 4096 -> segment
        tgt = jnp.asarray(rng.integers(0, K_small, O).astype(np.int32))
        host = jnp.asarray(rng.integers(0, K_small + 1, O).astype(np.int32))
        H1, b1 = ba.assemble_camera_system(terms, tgt, host, K_small)
        # embed the same observations in the larger system; the top-left
        # corner must match (the dump block moves, so exclude it)
        host_l = jnp.where(host == K_small, K_large, host)
        H2, b2 = ba.assemble_camera_system(terms, tgt, host_l, K_large)
        n_int = 6 * K_small  # interior (non-dump) rows
        np.testing.assert_allclose(
            np.asarray(H1)[:n_int, :n_int], np.asarray(H2)[:n_int, :n_int],
            rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(b1)[:n_int], np.asarray(b2)[:n_int],
            rtol=1e-5, atol=1e-4)


def _landmark_only_problem(rng, K=8, P=64, O=512):
    """Scene-only problem with every pose fixed (OptimizeLandmarker shape)."""
    poses = np.zeros((K, 7), np.float32)
    poses[:, 0] = 1.0
    poses[:, 4:] = rng.standard_normal((K, 3)).astype(np.float32) * 0.1
    pts_w = rng.standard_normal((P, 3)).astype(np.float32)
    pts_w[:, 2] += 5.0
    host = rng.integers(0, K, P)
    # rays/rho in host frame
    rays = np.zeros((P, 3), np.float32)
    rho = np.zeros(P, np.float32)
    from textslam_tpu.geometry import se3_np
    for p in range(P):
        pc = se3_np.apply(poses[host[p]], pts_w[p][None])[0]
        rays[p] = pc / pc[2]
        rho[p] = 1.0 / pc[2]
    fx = fy = 400.0
    cx = cy = 200.0
    tgt = rng.integers(0, K, O)
    pt = rng.integers(0, P, O)
    uv = np.zeros((O, 2), np.float32)
    for o in range(O):
        pc = se3_np.apply(poses[tgt[o]], pts_w[pt[o]][None])[0]
        uv[o] = [fx * pc[0] / pc[2] + cx, fy * pc[1] / pc[2] + cy]
    uv += rng.standard_normal((O, 2)).astype(np.float32) * 0.1
    scene = ba.SceneObs(
        tgt=jnp.asarray(tgt.astype(np.int32)),
        host=jnp.asarray(host[pt].astype(np.int32)),
        host_frozen_pose=jnp.asarray(poses[host[pt]]),
        host_in_window=jnp.ones(O, bool),
        point=jnp.asarray(pt.astype(np.int32)),
        ray=jnp.asarray(rays[pt]),
        uv=jnp.asarray(uv),
        weight=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    rho_noisy = rho * (1.0 + rng.standard_normal(P).astype(np.float32) * 0.05)
    return ba.BAProblem(
        poses=jnp.asarray(poses),
        pose_free=jnp.zeros(K, bool),
        rho=jnp.asarray(rho_noisy),
        rho_free=jnp.ones(P, bool),
        theta=jnp.zeros((1, 3), jnp.float32),
        theta_free=jnp.zeros(1, bool),
        scene=scene, text=None, images=None,
        fx=jnp.float32(fx), fy=jnp.float32(fy),
        cx=jnp.float32(cx), cy=jnp.float32(cy),
    ), rho


class TestNoFreePosesPath:
    def test_matches_full_solver(self):
        rng = np.random.default_rng(3)
        prob, rho_gt = _landmark_only_problem(rng)
        full = ba.solve_ba(prob, n_iters=15)
        fast = ba.solve_ba(prob, n_iters=15, no_free_poses=True)
        # identical LM schedule (delta_c == 0 in both); only reduction order
        # inside the landmark accumulations differs
        np.testing.assert_allclose(np.asarray(full.rho), np.asarray(fast.rho),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(full.poses), np.asarray(fast.poses))
        assert abs(float(full.cost) - float(fast.cost)) <= 1e-3 * max(
            1.0, abs(float(full.cost)))

    def test_converges_to_gt(self):
        rng = np.random.default_rng(4)
        prob, rho_gt = _landmark_only_problem(rng)
        out = ba.solve_ba(prob, n_iters=15, no_free_poses=True)
        err0 = np.abs(np.asarray(prob.rho) - rho_gt) / rho_gt
        err1 = np.abs(np.asarray(out.rho) - rho_gt) / rho_gt
        assert np.median(err1) < np.median(err0) * 0.25


class TestGlobalBAScale:
    def test_k128_scene_global_ba(self):
        """GlobalBA shape at K=128 (segment-sum camera path): executes on the
        CPU mesh and recovers poses perturbed from a consistent geometry."""
        rng = np.random.default_rng(5)
        K, P, O = 128, 512, 4096
        from textslam_tpu.geometry import se3_np
        poses = np.zeros((K, 7), np.float32)
        poses[:, 0] = 1.0
        for k in range(K):
            poses[k, 4] = 0.05 * k  # slow translation
        pts_w = rng.standard_normal((P, 3)).astype(np.float32)
        pts_w[:, 0] += 0.05 * rng.integers(0, K, P)
        pts_w[:, 2] += 6.0
        host = rng.integers(0, K, P)
        rays = np.zeros((P, 3), np.float32)
        rho = np.zeros(P, np.float32)
        for p in range(P):
            pc = se3_np.apply(poses[host[p]], pts_w[p][None])[0]
            rays[p] = pc / pc[2]
            rho[p] = 1.0 / pc[2]
        fx = fy = 400.0
        cx = cy = 200.0
        pt = rng.integers(0, P, O)
        tgt = (host[pt] + rng.integers(1, 6, O)) % K
        uv = np.zeros((O, 2), np.float32)
        for o in range(O):
            pc = se3_np.apply(poses[tgt[o]], pts_w[pt[o]][None])[0]
            uv[o] = [fx * pc[0] / pc[2] + cx, fy * pc[1] / pc[2] + cy]
        noisy = poses.copy()
        noisy[2:, 4:] += rng.standard_normal((K - 2, 3)).astype(np.float32) * 0.02
        pose_free = np.ones(K, bool)
        pose_free[:2] = False
        scene = ba.SceneObs(
            tgt=jnp.asarray(tgt.astype(np.int32)),
            host=jnp.asarray(host[pt].astype(np.int32)),
            host_frozen_pose=jnp.asarray(noisy[host[pt]]),
            host_in_window=jnp.ones(O, bool),
            point=jnp.asarray(pt.astype(np.int32)),
            ray=jnp.asarray(rays[pt]),
            uv=jnp.asarray(uv),
            weight=jnp.ones(O, jnp.float32),
            valid=jnp.ones(O, bool),
        )
        prob = ba.BAProblem(
            poses=jnp.asarray(noisy), pose_free=jnp.asarray(pose_free),
            rho=jnp.asarray(rho), rho_free=jnp.ones(P, bool),
            theta=jnp.zeros((1, 3), jnp.float32),
            theta_free=jnp.zeros(1, bool),
            scene=scene, text=None, images=None,
            fx=jnp.float32(fx), fy=jnp.float32(fy),
            cx=jnp.float32(cx), cy=jnp.float32(cy),
        )
        out = ba.solve_ba(prob, n_iters=10)
        err0 = np.linalg.norm(noisy[:, 4:] - poses[:, 4:], axis=1)
        err1 = np.linalg.norm(np.asarray(out.poses)[:, 4:] - poses[:, 4:], axis=1)
        assert np.isfinite(float(out.cost))
        assert np.median(err1) < np.median(err0) * 0.3
