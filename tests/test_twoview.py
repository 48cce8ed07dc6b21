import numpy as np
import jax
import jax.numpy as jnp

from textslam_tpu.geometry import twoview, se3
from textslam_tpu.geometry.quaternion import qexp, qto_matrix

RNG = np.random.default_rng(3)
FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def project(P_cam):
    return np.stack([FX * P_cam[:, 0] / P_cam[:, 2] + CX, FY * P_cam[:, 1] / P_cam[:, 2] + CY], -1)


def make_scene(n=200, planar=False, noise=0.0):
    if planar:
        P = np.stack(
            [RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n), np.full(n, 5.0)], -1
        )
        P[:, 2] += 0.3 * P[:, 0] + 0.2 * P[:, 1]  # tilted plane
    else:
        P = np.stack(
            [RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n), RNG.uniform(3, 8, n)], -1
        )
    q = np.array(qexp(jnp.array([0.02, -0.1, 0.03])))
    t = np.array([0.4, 0.05, 0.1])
    R = np.array(qto_matrix(jnp.asarray(q)))
    P2 = P @ R.T + t
    uv1 = project(P) + RNG.normal(0, noise, (n, 2))
    uv2 = project(P2) + RNG.normal(0, noise, (n, 2))
    T21 = np.concatenate([q, t])
    return P, uv1, uv2, T21


class TestSolvers:
    def test_f_epipolar_constraint(self):
        P, uv1, uv2, _ = make_scene(8)
        F = twoview.solve_f_8pt(jnp.asarray(uv1)[None], jnp.asarray(uv2)[None])[0]
        x1 = np.concatenate([uv1, np.ones((8, 1))], -1)
        x2 = np.concatenate([uv2, np.ones((8, 1))], -1)
        res = np.abs(np.einsum("ni,ij,nj->n", x2, np.array(F), x1))
        scale = np.abs(np.array(F)).max()
        assert (res / scale < 1e-2).all()

    def test_h_maps_planar_points(self):
        P, uv1, uv2, _ = make_scene(8, planar=True)
        H = twoview.solve_h_8pt(jnp.asarray(uv1)[None], jnp.asarray(uv2)[None])[0]
        x1 = np.concatenate([uv1, np.ones((8, 1))], -1)
        pred = x1 @ np.array(H).T
        pred = pred[:, :2] / pred[:, 2:3]
        np.testing.assert_allclose(pred, uv2, atol=0.1)


class TestInitialize:
    def _run(self, planar, noise=0.3):
        P, uv1, uv2, T21 = make_scene(300, planar=planar, noise=noise)
        res = twoview.initialize_two_view(
            jax.random.PRNGKey(0),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(300, bool),
            FX, FY, CX, CY,
        )
        return res, T21, P

    def test_general_scene_recovers_pose(self):
        res, T21, P = self._run(planar=False)
        assert bool(res.success)
        got_q = np.array(res.T21[:4])
        want_q = T21[:4]
        assert abs(abs(np.dot(got_q, want_q)) - 1.0) < 1e-3
        # translation up to scale
        got_t = np.array(res.T21[4:])
        want_t = T21[4:] / np.linalg.norm(T21[4:])
        assert np.linalg.norm(np.abs(got_t) - np.abs(want_t)) < 0.05
        cos = np.dot(got_t, want_t)
        assert cos > 0.99

    def test_planar_scene_selects_h(self):
        res, T21, P = self._run(planar=True)
        assert float(res.score_ratio) > 0.4
        assert bool(res.success)
        got_q = np.array(res.T21[:4])
        assert abs(abs(np.dot(got_q, T21[:4])) - 1.0) < 1e-3

    def test_triangulated_structure(self):
        res, T21, P = self._run(planar=False, noise=0.0)
        inl = np.array(res.is_inlier)
        got = np.array(res.points)[inl]
        want = P[inl]
        # recovered up to global scale: compare normalized shapes
        s = np.median(want[:, 2]) / np.median(got[:, 2])
        np.testing.assert_allclose(got * s, want, atol=0.05)

    def test_with_outliers(self):
        P, uv1, uv2, T21 = make_scene(300, planar=False, noise=0.3)
        n_out = 60
        uv2[:n_out] = RNG.uniform(0, 640, (n_out, 2))
        res = twoview.initialize_two_view(
            jax.random.PRNGKey(1),
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(300, bool),
            FX, FY, CX, CY,
        )
        assert bool(res.success)
        inl = np.array(res.is_inlier)
        assert inl[:n_out].sum() <= 3  # outliers rejected
        got_q = np.array(res.T21[:4])
        assert abs(abs(np.dot(got_q, T21[:4])) - 1.0) < 1e-3
