import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from textslam_tpu.geometry import quaternion as Q
from textslam_tpu.geometry import se3, sim3, plane, camera, triangulate

RNG = np.random.default_rng(0)


def rand_quat(n=()):
    q = RNG.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def rand_pose(n=()):
    return se3.pack(rand_quat(n), jnp.asarray(RNG.normal(size=n + (3,))))


class TestQuaternion:
    def test_mul_matches_scipy(self):
        a, b = np.array(rand_quat((5,))), np.array(rand_quat((5,)))
        got = np.array(Q.qmul(jnp.asarray(a), jnp.asarray(b)))
        # scipy uses xyzw
        ra = Rotation.from_quat(a[:, [1, 2, 3, 0]])
        rb = Rotation.from_quat(b[:, [1, 2, 3, 0]])
        want = (ra * rb).as_quat()[:, [3, 0, 1, 2]]
        sign = np.sign((got * want).sum(-1, keepdims=True))
        np.testing.assert_allclose(got, want * sign, atol=1e-6)

    def test_rotate_matches_matrix(self):
        q = rand_quat((7,))
        v = jnp.asarray(RNG.normal(size=(7, 3)))
        np.testing.assert_allclose(
            np.array(Q.qrotate(q, v)),
            np.einsum("nij,nj->ni", np.array(Q.qto_matrix(q)), np.array(v)),
            atol=1e-6,
        )

    def test_matrix_roundtrip(self):
        q = rand_quat((20,))
        q2 = Q.qfrom_matrix(Q.qto_matrix(q))
        sign = jnp.sign((q * q2).sum(-1, keepdims=True))
        np.testing.assert_allclose(np.array(q2 * sign), np.array(q), atol=1e-6)

    def test_exp_log_roundtrip(self):
        w = jnp.asarray(RNG.normal(size=(10, 3)) * 0.8)
        np.testing.assert_allclose(np.array(Q.qlog(Q.qexp(w))), np.array(w), atol=1e-6)
        # tiny angles
        w = jnp.asarray(RNG.normal(size=(10, 3)) * 1e-10)
        np.testing.assert_allclose(np.array(Q.qlog(Q.qexp(w))), np.array(w), atol=1e-12)

    def test_exp_angle(self):
        w = jnp.array([[0.3, 0.0, 0.0]])
        R = Q.qto_matrix(Q.qexp(w))
        want = Rotation.from_rotvec([0.3, 0, 0]).as_matrix()
        np.testing.assert_allclose(np.array(R[0]), want, atol=1e-6)


class TestSE3:
    def test_compose_inverse(self):
        A, B = rand_pose((6,)), rand_pose((6,))
        p = jnp.asarray(RNG.normal(size=(6, 3)))
        np.testing.assert_allclose(
            np.array(se3.apply(se3.compose(A, B), p)),
            np.array(se3.apply(A, se3.apply(B, p))),
            atol=1e-5,
        )
        ident = se3.compose(A, se3.inverse(A))
        np.testing.assert_allclose(np.array(se3.apply(ident, p)), np.array(p), atol=1e-5)

    def test_relative(self):
        A, B = rand_pose(()), rand_pose(())
        p_w = jnp.asarray(RNG.normal(size=(3,)))
        p_a = se3.apply(A, p_w)
        p_b = se3.apply(B, p_w)
        np.testing.assert_allclose(
            np.array(se3.apply(se3.relative(A, B), p_b)), np.array(p_a), atol=1e-5
        )

    def test_retract_zero(self):
        T = rand_pose((4,))
        T2 = se3.retract(T, jnp.zeros((4, 6)))
        np.testing.assert_allclose(np.array(T2), np.array(T), atol=1e-6)


class TestSim3:
    def test_compose_apply(self):
        A = sim3.pack(rand_quat((5,)), jnp.asarray(RNG.normal(size=(5, 3))), jnp.asarray(RNG.uniform(0.5, 2.0, (5,))))
        B = sim3.pack(rand_quat((5,)), jnp.asarray(RNG.normal(size=(5, 3))), jnp.asarray(RNG.uniform(0.5, 2.0, (5,))))
        p = jnp.asarray(RNG.normal(size=(5, 3)))
        np.testing.assert_allclose(
            np.array(sim3.apply(sim3.compose(A, B), p)),
            np.array(sim3.apply(A, sim3.apply(B, p))),
            atol=1e-5,
        )

    def test_inverse(self):
        S = sim3.pack(rand_quat((5,)), jnp.asarray(RNG.normal(size=(5, 3))), jnp.asarray(RNG.uniform(0.5, 2.0, (5,))))
        p = jnp.asarray(RNG.normal(size=(5, 3)))
        np.testing.assert_allclose(
            np.array(sim3.apply(sim3.inverse(S), sim3.apply(S, p))), np.array(p), atol=1e-5
        )

    def test_exp_log_roundtrip(self):
        tau = jnp.asarray(RNG.normal(size=(10, 7)) * 0.5)
        got = sim3.logm(sim3.expm(tau))
        np.testing.assert_allclose(np.array(got), np.array(tau), atol=1e-4)

    def test_log_identity(self):
        np.testing.assert_allclose(np.array(sim3.logm(sim3.identity((3,)))), 0.0, atol=1e-8)

    def test_horn_exact(self):
        S_true = sim3.pack(rand_quat(()), jnp.asarray(RNG.normal(size=(3,))), jnp.asarray(1.7))
        P2 = jnp.asarray(RNG.normal(size=(30, 3)))
        P1 = sim3.apply(S_true, P2)
        S_est = sim3.horn_alignment(P1, P2)
        np.testing.assert_allclose(np.array(sim3.apply(S_est, P2)), np.array(P1), atol=1e-4)
        np.testing.assert_allclose(float(S_est[7]), 1.7, atol=1e-4)

    def test_horn_masked(self):
        S_true = sim3.pack(rand_quat(()), jnp.asarray(RNG.normal(size=(3,))), jnp.asarray(0.6))
        P2 = jnp.asarray(RNG.normal(size=(20, 3)))
        P1 = sim3.apply(S_true, P2)
        # corrupt masked-out rows
        P1 = P1.at[15:].set(999.0)
        w = jnp.ones(20).at[15:].set(0.0)
        S_est = sim3.horn_alignment(P1, P2, w=w)
        np.testing.assert_allclose(
            np.array(sim3.apply(S_est, P2[:15])), np.array(P1[:15]), atol=1e-4
        )

    def test_horn_batched(self):
        S_true = sim3.pack(rand_quat((4,)), jnp.asarray(RNG.normal(size=(4, 3))), jnp.asarray(RNG.uniform(0.5, 2.0, (4,))))
        P2 = jnp.asarray(RNG.normal(size=(4, 10, 3)))
        P1 = sim3.apply(S_true[:, None], P2)
        S_est = sim3.horn_alignment(P1, P2)
        np.testing.assert_allclose(
            np.array(sim3.apply(S_est[:, None], P2)), np.array(P1), atol=1e-4
        )


class TestPlane:
    def test_inv_depth_consistency(self):
        theta = jnp.array([0.1, -0.2, -0.5])
        ray = plane.ray_from_pixel(jnp.array([[100.0, 120.0], [300.0, 200.0]]), 500.0, 500.0, 320.0, 240.0)
        p = plane.backproject(ray, theta)
        # plane equation theta^T p + 1 = 0
        np.testing.assert_allclose(np.array((p * theta).sum(-1) + 1.0), 0.0, atol=1e-6)

    def test_transform_theta(self):
        theta_r = jnp.array([0.05, -0.1, -0.4])
        T_rw = rand_pose(())
        theta_w = plane.transform_theta(theta_r, T_rw)
        # a point on the plane in r coords, moved to world, satisfies world plane eq
        ray = jnp.array([[0.1, 0.2, 1.0], [-0.3, 0.05, 1.0]])
        p_r = plane.backproject(ray, theta_r)
        p_w = se3.apply(se3.inverse(T_rw), p_r)
        np.testing.assert_allclose(np.array((p_w * theta_w).sum(-1) + 1.0), 0.0, atol=1e-5)

    def test_solve_theta_3pt_exact(self):
        theta = jnp.array([0.07, -0.03, -0.6])
        rays = jnp.asarray(RNG.normal(size=(3, 2)) * 0.3)
        rays = jnp.concatenate([rays, jnp.ones((3, 1))], axis=-1)
        rhos = plane.inv_depth(rays, theta)
        got = plane.solve_theta_3pt(rays, rhos)
        np.testing.assert_allclose(np.array(got), np.array(theta), atol=1e-5)

    def test_fit_theta_lstsq_masked(self):
        theta = jnp.array([0.07, -0.03, -0.6])
        rays = jnp.asarray(RNG.normal(size=(12, 2)) * 0.3)
        rays = jnp.concatenate([rays, jnp.ones((12, 1))], axis=-1)
        rhos = plane.inv_depth(rays, theta)
        rhos = rhos.at[10:].set(5.0)  # outliers, masked
        w = jnp.ones(12).at[10:].set(0.0)
        got = plane.fit_theta_lstsq(rays, rhos, w)
        np.testing.assert_allclose(np.array(got), np.array(theta), atol=1e-4)


class TestCameraTriangulate:
    def test_project_unproject(self):
        uv = jnp.asarray(RNG.uniform(0, 640, size=(10, 2)))
        ray = camera.unproject(uv, 500.0, 480.0, 320.0, 240.0)
        uv2 = camera.project(ray * 3.7, 500.0, 480.0, 320.0, 240.0)
        np.testing.assert_allclose(np.array(uv2), np.array(uv), atol=1e-4)

    def test_project_jacobian_ad(self):
        import jax

        p = jnp.array([0.3, -0.2, 2.0])
        J = camera.project_jacobian(p, 500.0, 480.0)
        J_ad = jax.jacfwd(lambda q: camera.project(q, 500.0, 480.0, 320.0, 240.0))(p)
        np.testing.assert_allclose(np.array(J), np.array(J_ad), rtol=1e-5, atol=1e-5)

    def test_triangulate_exact(self):
        T1 = se3.identity()
        T2 = rand_pose(())
        P_w = jnp.asarray(RNG.normal(size=(20, 3)) + np.array([0, 0, 5.0]))
        r1 = se3.apply(T1, P_w)
        r2 = se3.apply(T2, P_w)
        ray1 = r1 / r1[..., 2:3]
        ray2 = r2 / r2[..., 2:3]
        got = triangulate.triangulate(ray1, ray2, T1, T2)
        np.testing.assert_allclose(np.array(got), np.array(P_w), atol=1e-3)


class TestSe3NpParity:
    """geometry.se3_np must bit-track geometry.se3 (host glue twins)."""

    def _rand_pose(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        return np.concatenate([q, rng.normal(size=3)]).astype(np.float32)

    def test_all_ops(self):
        from textslam_tpu.geometry import se3, se3_np

        rng = np.random.default_rng(11)
        A = self._rand_pose(rng)
        B = self._rand_pose(rng)
        p = rng.normal(size=(5, 3)).astype(np.float32)
        np.testing.assert_allclose(
            se3_np.compose(A, B), np.asarray(se3.compose(jnp.asarray(A), jnp.asarray(B))), atol=1e-6)
        np.testing.assert_allclose(
            se3_np.inverse(A), np.asarray(se3.inverse(jnp.asarray(A))), atol=1e-6)
        np.testing.assert_allclose(
            se3_np.relative(A, B), np.asarray(se3.relative(jnp.asarray(A), jnp.asarray(B))), atol=1e-6)
        np.testing.assert_allclose(
            se3_np.apply(A, p), np.asarray(se3.apply(jnp.asarray(A), jnp.asarray(p))), atol=1e-5)
        np.testing.assert_allclose(se3_np.identity(), np.asarray(se3.identity()), atol=0)

    def test_camera_and_rotmat(self):
        from textslam_tpu.geometry import se3_np
        from textslam_tpu.geometry.camera import project, unproject
        from textslam_tpu.geometry.quaternion import qto_matrix

        rng = np.random.default_rng(12)
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        np.testing.assert_allclose(
            se3_np.qto_matrix(q), np.asarray(qto_matrix(jnp.asarray(q))), atol=1e-6)
        uv = rng.uniform(0, 640, size=(7, 2)).astype(np.float32)
        np.testing.assert_allclose(
            se3_np.unproject(uv, 500.0, 501.0, 320.0, 240.0),
            np.asarray(unproject(jnp.asarray(uv), 500.0, 501.0, 320.0, 240.0)), atol=1e-6)
        p = rng.normal(size=(7, 3)).astype(np.float32)
        p[:, 2] += 3.0
        np.testing.assert_allclose(
            se3_np.project(p, 500.0, 501.0, 320.0, 240.0),
            np.asarray(project(jnp.asarray(p), 500.0, 501.0, 320.0, 240.0)), atol=1e-4)
