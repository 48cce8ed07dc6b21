import numpy as np
import jax
import jax.numpy as jnp

from textslam_tpu.solver import sim3_opt
from textslam_tpu.geometry import sim3, se3
from textslam_tpu.geometry.quaternion import qexp

RNG = np.random.default_rng(7)
FX, FY, CX, CY = 420.0, 420.0, 320.0, 240.0


def make_pair(n=60, noise=0.0, outliers=0):
    """3D-3D matched points in two camera frames related by a Sim3."""
    S = np.asarray(sim3.pack(
        jnp.asarray(np.array(qexp(jnp.asarray([0.05, -0.1, 0.08])))),
        jnp.asarray([0.3, -0.2, 0.5]),
        jnp.asarray(1.4),
    ))
    P2 = np.stack([RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n), RNG.uniform(3, 7, n)], -1)
    P1 = np.asarray(sim3.apply(jnp.asarray(S)[None], jnp.asarray(P2.astype(np.float32))))
    uv1 = np.stack([FX * P1[:, 0] / P1[:, 2] + CX, FY * P1[:, 1] / P1[:, 2] + CY], -1)
    uv2 = np.stack([FX * P2[:, 0] / P2[:, 2] + CX, FY * P2[:, 1] / P2[:, 2] + CY], -1)
    P1n = P1 + RNG.normal(0, noise, P1.shape)
    if outliers:
        P1n[:outliers] += RNG.uniform(1, 3, (outliers, 3))
    return S, jnp.asarray(P1n.astype(np.float32)), jnp.asarray(P2.astype(np.float32)), jnp.asarray(uv1.astype(np.float32)), jnp.asarray(uv2.astype(np.float32))


class TestSim3Ransac:
    def test_exact(self):
        S, P1, P2, uv1, uv2 = make_pair()
        S_est, inl, n = sim3_opt.sim3_ransac(
            jax.random.PRNGKey(0), P1, P2, uv1, uv2, jnp.ones(P1.shape[0], bool),
            FX, FY, CX, CY)
        assert int(n) >= 55
        np.testing.assert_allclose(float(S_est[7]), S[7], rtol=1e-3)
        assert abs(abs(float((S_est[:4] * S[:4]).sum())) - 1) < 1e-4

    def test_with_outliers(self):
        S, P1, P2, uv1, uv2 = make_pair(outliers=15)
        S_est, inl, n = sim3_opt.sim3_ransac(
            jax.random.PRNGKey(1), P1, P2, uv1, uv2, jnp.ones(P1.shape[0], bool),
            FX, FY, CX, CY)
        assert int(n) >= 40
        assert int(inl[:15].sum()) <= 2
        np.testing.assert_allclose(float(S_est[7]), S[7], rtol=0.02)


class TestSim3Refine:
    def test_refines_perturbed(self):
        S, P1, P2, uv1, uv2 = make_pair(noise=0.002)
        pert = sim3.compose(sim3.expm(jnp.asarray([0.02, -0.01, 0.03, 0.05, -0.02, 0.04, 0.05])), jnp.asarray(S))
        S_ref, inl = sim3_opt.refine_sim3(pert, P1, P2, uv1, uv2, jnp.ones(P1.shape[0], bool), FX, FY, CX, CY)
        assert int(inl.sum()) >= 55
        np.testing.assert_allclose(float(S_ref[7]), S[7], rtol=0.01)
        assert abs(abs(float((S_ref[:4] * S[:4]).sum())) - 1) < 1e-4


class TestPoseGraph:
    def test_loop_correction(self):
        """Classic drifted-loop pose graph: chain with odometry edges + one
        loop edge back to the start; after optimization the accumulated drift
        spreads and the loop constraint is satisfied."""
        N = 12
        # ground truth: camera on a circle
        gts = []
        for i in range(N):
            ang = 2 * np.pi * i / N
            q = np.array(qexp(jnp.asarray([0.0, 0.0, ang])))
            t = np.array([np.cos(ang), np.sin(ang), 0.0])
            gts.append(np.asarray(sim3.from_se3(jnp.asarray(np.concatenate([q, t]).astype(np.float32)))))
        gts = np.stack(gts)

        # odometry measurements S_ba exact; initial nodes = integrated with
        # noise (drift)
        nodes = [gts[0]]
        for i in range(1, N):
            S_ba = np.asarray(sim3.compose(jnp.asarray(gts[i]), sim3.inverse(jnp.asarray(gts[i - 1]))))
            noise = sim3.expm(jnp.asarray(np.concatenate([RNG.normal(0, 0.02, 6), [0.01]]).astype(np.float32)))
            nodes.append(np.asarray(sim3.compose(jnp.asarray(S_ba), sim3.compose(noise, jnp.asarray(nodes[-1])))))
        nodes = np.stack(nodes)

        edge_a, edge_b, meas = [], [], []
        for i in range(1, N):
            edge_a.append(i - 1)
            edge_b.append(i)
            meas.append(np.asarray(sim3.compose(jnp.asarray(gts[i]), sim3.inverse(jnp.asarray(gts[i - 1])))))
        # loop edge N-1 -> 0
        edge_a.append(N - 1)
        edge_b.append(0)
        meas.append(np.asarray(sim3.compose(jnp.asarray(gts[0]), sim3.inverse(jnp.asarray(gts[N - 1])))))

        graph = sim3_opt.PoseGraph(
            nodes=jnp.asarray(nodes),
            fixed=jnp.asarray([True] + [False] * (N - 1)),
            edge_a=jnp.asarray(edge_a, dtype=jnp.int32),
            edge_b=jnp.asarray(edge_b, dtype=jnp.int32),
            edge_meas=jnp.asarray(np.stack(meas)),
            edge_valid=jnp.ones(len(edge_a), dtype=bool),
            edge_weight=jnp.ones(len(edge_a)),
        )
        out, cost = sim3_opt.solve_pose_graph(graph, n_iters=25)
        # residual drops and nodes approach GT up to the fixed gauge
        err0 = np.linalg.norm(nodes[:, 4:7] - gts[:, 4:7], axis=-1).max()
        err1 = np.linalg.norm(np.asarray(out)[:, 4:7] - gts[:, 4:7], axis=-1).max()
        assert err1 < 0.05
        assert err1 < err0 / 3
        s_err = np.abs(np.asarray(out)[:, 7] - 1.0).max()
        assert s_err < 0.02
