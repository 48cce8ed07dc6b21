"""Sharded BA + batched feature extraction on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textslam_tpu.parallel import ba_sharded, features
from textslam_tpu.solver import ba
from test_solver_ba import make_ba_problem


@pytest.fixture(scope="module")
def mesh():
    return ba_sharded.make_mesh()


class TestShardedBA:
    def test_matches_single_device_assembly(self, mesh):
        problem, poses_gt, rho_gt = make_ba_problem()
        # single-device reference
        ts = ba.scene_terms(problem, 2.447)
        K = problem.poses.shape[0]
        Pn = problem.rho.shape[0]
        Hcc0, bc0 = ba.assemble_camera_system(ts, problem.scene.tgt, problem.scene.host, K)
        W0, Hll0, bl0 = ba.assemble_landmark_system(
            ts, problem.scene.tgt, problem.scene.host, problem.scene.point, Pn, K, 1
        )
        Hcc, bc, W, Hll, bl, cost = ba_sharded.sharded_scene_normal_eqs(problem, mesh, 2.447)
        # psum accumulation order differs from the single-device reduction;
        # f32 tolerances reflect reassociation only
        np.testing.assert_allclose(np.asarray(Hcc), np.asarray(Hcc0), rtol=5e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(bc), np.asarray(bc0), rtol=5e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(Hll), np.asarray(Hll0), rtol=5e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(W), np.asarray(W0), rtol=5e-4, atol=2e-3)

    def test_step_reduces_cost(self, mesh):
        problem, poses_gt, rho_gt = make_ba_problem()
        poses, rho, cost0 = ba_sharded.sharded_ba_step(problem, mesh)
        p2 = problem._replace(poses=poses, rho=rho)
        _, _, cost1 = ba_sharded.sharded_ba_step(p2, mesh)
        assert float(cost1) < float(cost0)

    def test_iterated_steps_converge(self, mesh):
        problem, poses_gt, rho_gt = make_ba_problem()
        p = problem
        for _ in range(8):
            poses, rho, cost = ba_sharded.sharded_ba_step(p, mesh)
            p = p._replace(poses=poses, rho=rho)
        # compare against ground truth poses
        for k in range(2, poses_gt.shape[0]):
            dq = float(jnp.abs((p.poses[k, :4] * poses_gt[k, :4]).sum()))
            assert 1 - dq < 1e-5
            assert float(jnp.linalg.norm(p.poses[k, 4:] - poses_gt[k, 4:])) < 5e-3


class TestShardedLMLoop:
    """solve_ba_sharded = the FULL deferred-accept LM loop over the mesh
    (VERDICT r1 item 1): must reproduce solve_ba exactly, not just one step."""

    def test_scene_only_matches_solve_ba(self, mesh):
        problem, poses_gt, rho_gt = make_ba_problem()
        st1 = ba.solve_ba(problem, n_iters=6)
        st8 = ba_sharded.solve_ba_sharded(problem, mesh, n_iters=6)
        np.testing.assert_allclose(np.asarray(st8.poses), np.asarray(st1.poses),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(st8.rho), np.asarray(st1.rho),
                                   rtol=1e-4, atol=1e-6)
        assert abs(float(st8.cost) - float(st1.cost)) <= 1e-3 * max(1.0, float(st1.cost))

    def test_joint_text_matches_solve_ba(self, mesh):
        from __graft_entry__ import _synthetic_problem

        problem = _synthetic_problem(n_kf=4, n_pts=128, obs_per_kf=64, n_text=4,
                                     text_feat=8, img_hw=(96, 128), with_text=True)
        st1 = ba.solve_ba(problem, n_iters=4)
        st8 = ba_sharded.solve_ba_sharded(problem, mesh, n_iters=4)
        np.testing.assert_allclose(np.asarray(st8.poses), np.asarray(st1.poses),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(st8.theta), np.asarray(st1.theta),
                                   atol=1e-4)

    def test_unpadded_obs_count(self, mesh):
        """Observation counts that don't divide the mesh get padded host-side."""
        problem, _, _ = make_ba_problem()
        odd = jax.tree.map(lambda x: x[:-3], problem.scene)
        problem = problem._replace(scene=odd)
        st8 = ba_sharded.solve_ba_sharded(problem, mesh, n_iters=3)
        st1 = ba.solve_ba(problem, n_iters=3)
        np.testing.assert_allclose(np.asarray(st8.poses), np.asarray(st1.poses),
                                   atol=1e-5)


class TestBatchedFeatures:
    def test_sharded_extraction(self, mesh):
        import synth

        rng = np.random.default_rng(0)
        world = synth.PlaneWorld(seed=1)
        poses = synth.camera_path(8)
        imgs = jnp.asarray(np.stack([world.render(p) for p in poses]))
        kp = features.batched_extract(imgs, mesh, n_features=200, n_levels=2)
        assert kp.uv.shape[0] == 8
        assert bool(kp.valid.any())
        # per-frame results identical to unsharded extraction
        from textslam_tpu.ops import orb

        kp0 = orb.extract_orb(imgs[3], n_features=200, n_levels=2)
        np.testing.assert_allclose(np.asarray(kp.uv[3]), np.asarray(kp0.uv), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(kp.desc[3]), np.asarray(kp0.desc))


class TestLandmarkShardedBA:
    """Landmark-sharded Schur elimination: per-landmark blocks stay
    shard-local; only the [n, n] reduced camera system psums."""

    def test_matches_observation_sharded_step(self, mesh):
        problem, poses_gt, rho_gt = make_ba_problem()
        p0, r0, c0 = ba_sharded.sharded_ba_step(problem, mesh)
        p1, r1, c1 = ba_sharded.sharded_ba_step_landmark(problem, mesh)
        np.testing.assert_allclose(float(c1), float(c0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=1e-4, atol=1e-5)

    def test_iterated_converges(self, mesh):
        problem, poses_gt, rho_gt = make_ba_problem()
        p = problem
        for _ in range(8):
            poses, rho, cost = ba_sharded.sharded_ba_step_landmark(p, mesh)
            p = p._replace(poses=poses, rho=rho)
        for k in range(2, poses_gt.shape[0]):
            dq = float(jnp.abs((p.poses[k, :4] * poses_gt[k, :4]).sum()))
            assert 1 - dq < 1e-5
            assert float(jnp.linalg.norm(p.poses[k, 4:] - poses_gt[k, 4:])) < 5e-3


class TestShardedTextBA:
    """Joint scene+text sharded step: text observations shard the same way;
    theta eliminates via shard-local 3x3 Schur blocks."""

    def _text_problem(self):
        from __graft_entry__ import _synthetic_problem

        # full-size images: the generator's intrinsics assume 640x480, and
        # baseline-induced projection shifts (~85 px) must stay in-image
        return _synthetic_problem(n_kf=4, n_pts=256, obs_per_kf=128,
                                  n_text=4, text_feat=8, img_hw=(480, 640),
                                  with_text=True, seed=5)

    def test_matches_single_device_assembly(self, mesh):
        problem = self._text_problem()
        tt = ba.text_terms(problem, 3.0)
        K = problem.poses.shape[0]
        T = problem.theta.shape[0]
        Hcc0, bc0 = ba.assemble_camera_system(tt, problem.text.tgt, problem.text.host, K)
        Wt0, Ht0, bt0 = ba.assemble_landmark_system(
            tt, problem.text.tgt, problem.text.host, problem.text.text, T, K, 3
        )
        Hcc, bc, Wt, Ht, bt, cost = ba_sharded.sharded_text_normal_eqs(problem, mesh, 3.0)
        np.testing.assert_allclose(np.asarray(Hcc), np.asarray(Hcc0), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(bc), np.asarray(bc0), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Ht), np.asarray(Ht0), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Wt), np.asarray(Wt0), rtol=1e-4, atol=1e-3)

    def test_joint_step_reduces_cost(self, mesh):
        problem = self._text_problem()
        # make the photometric refs consistent with the current state (the
        # synthetic generator uses random refs — fine for timing, but a raw
        # GN step has no accept/reject, so descent needs a real optimum)
        tt = ba.text_terms(problem, 1e9)
        r_unw = np.asarray(tt["r"]) / np.asarray(problem.text.weight)[:, None]
        ref_new = np.asarray(problem.text.ref_inten) + r_unw
        text = problem.text._replace(ref_inten=jnp.asarray(ref_new))
        # sub-pixel theta perturbation: photometric linearization is only
        # valid within the image-gradient radius (direct-method basin).
        # rho freezes: a raw GN step has no accept/reject, and weakly
        # observed points (near-zero Schur diagonal) produce unbounded
        # inverse-depth updates that solve_ba's deferred-accept LM would
        # reject — here we validate the sharded text mechanism, not LM.
        theta_pert = problem.theta * 1.002 + 0.0003
        problem = problem._replace(
            text=text, theta=theta_pert,
            rho_free=jnp.zeros_like(problem.rho_free))
        poses, rho, theta, cost0 = ba_sharded.sharded_ba_step(
            problem, mesh, lam=0.1)
        p2 = problem._replace(poses=poses, rho=rho, theta=theta)
        _, _, _, cost1 = ba_sharded.sharded_ba_step(p2, mesh, lam=0.1)
        assert float(cost1) < float(cost0)


class TestShardedCovisibility:
    """Keyframe-axis map sharding (SURVEY.md §2.4 'map sharding' row)."""

    def test_product_bit_matches_host(self):
        from textslam_tpu.parallel import covis_sharded
        from textslam_tpu import native

        rng = np.random.default_rng(0)
        mesh = covis_sharded.make_mesh(8)
        for K in (5, 64, 200):  # incl. non-multiples of the mesh size
            inc = rng.random((K, 333)) < 0.15
            M_dev = covis_sharded.covis_product(inc, mesh)
            M_host = native.covis_product(inc)
            np.testing.assert_array_equal(M_dev, M_host)

    def test_weighted_product_matches(self):
        from textslam_tpu.parallel import covis_sharded

        rng = np.random.default_rng(1)
        mesh = covis_sharded.make_mesh(8)
        inc = rng.random((37, 100)) < 0.2
        w = rng.integers(0, 64, 100)
        M_dev = covis_sharded.covis_product(inc, mesh, w=w)
        inc_i = inc.astype(np.int64)
        M_ref = (inc_i * w[None, :]) @ inc_i.T
        np.fill_diagonal(M_ref, 0)
        np.testing.assert_array_equal(M_dev, M_ref)

    def test_map_rebuild_uses_sharded_path(self):
        """SlamMap dispatches its M1/M2/M3 rebuilds to the sharded product
        when configured and the map exceeds covis_min_kfs."""
        import dataclasses
        from textslam_tpu.config import TextSLAMConfig, CameraConfig, ParallelConfig
        from textslam_tpu.mapper.state import SlamMap, Keyframe

        cfg = TextSLAMConfig(
            camera=CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=120.0),
            parallel=ParallelConfig(covis_devices=8, covis_min_kfs=4),
        )
        m = SlamMap(cfg)
        assert m._covis_mesh is not None
        ident = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        rng = np.random.default_rng(2)
        for kid in range(8):
            kf = Keyframe(
                kid=kid, frame_id=kid, timestamp=float(kid),
                kp_uv=np.zeros((16, 2), np.float32),
                kp_level=np.zeros(16, np.int32),
                kp_angle=np.zeros(16, np.float32),
                kp_desc=np.zeros((16, 8), np.uint32),
                kp_valid=np.ones(16, bool),
                kp_point=np.full(16, -1, np.int32),
                obs_good=np.zeros(16, bool),
            )
            m.add_keyframe(kf, ident)
        pids = [m.add_point(0, np.array([0, 0, 1.0], np.float32), 1.0,
                            np.zeros(8, np.uint32)) for _ in range(12)]
        for kid in range(8):
            for i, p in enumerate(pids):
                if rng.random() < 0.5:
                    m.add_observation(kid, i, p)
        m.rebuild_covis_m1()  # sharded rebuild (K=8 >= covis_min_kfs=4)
        inc = m._point_incidence().astype(np.int64)
        M_ref = inc @ inc.T
        np.fill_diagonal(M_ref, 0)
        np.testing.assert_array_equal(m.M1[:8, :8], M_ref)
