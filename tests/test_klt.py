import numpy as np
import jax.numpy as jnp
import cv2

from textslam_tpu.ops import klt, pyramid

RNG = np.random.default_rng(9)


def shifted_pair(dx=3.7, dy=-2.2, h=120, w=160):
    big = RNG.uniform(0, 255, (h + 40, w + 40)).astype(np.float32)
    big = cv2.GaussianBlur(big, (0, 0), 2.0)
    big -= big.min(); big *= 255.0 / big.max()
    I = big[20 : 20 + h, 20 : 20 + w]
    M = np.float32([[1, 0, -dx], [0, 1, -dy]])
    Jf = cv2.warpAffine(big, M, (big.shape[1], big.shape[0]))[20 : 20 + h, 20 : 20 + w]
    return I.copy(), Jf.copy()


class TestKLT:
    def test_tracks_translation(self):
        I, J = shifted_pair()
        pi, gi = pyramid.build_pyramid(jnp.asarray(I), levels=4)
        pj, gj = pyramid.build_pyramid(jnp.asarray(J), levels=4)
        uv = jnp.asarray(
            np.stack([RNG.uniform(20, 140, 30), RNG.uniform(20, 100, 30)], -1).astype(np.float32)
        )
        out, valid = klt.klt_track(pi, gi, pj, uv, jnp.ones(30, bool))
        got = np.asarray(out)[np.asarray(valid)]
        # J is big shifted by -(dx,dy), so tracked flow is -(dx,dy)
        want = np.asarray(uv)[np.asarray(valid)] + [-3.7, 2.2]
        assert np.asarray(valid).sum() >= 15
        err = np.linalg.norm(got - want, axis=-1)
        assert np.median(err) < 0.5, f"median flow err {np.median(err)}"

    def test_rejects_out_of_image(self):
        I, J = shifted_pair(dx=0, dy=0)
        pi, gi = pyramid.build_pyramid(jnp.asarray(I), levels=3)
        pj, gj = pyramid.build_pyramid(jnp.asarray(J), levels=3)
        uv = jnp.asarray(np.array([[2.0, 2.0], [80.0, 60.0]], np.float32))
        out, valid = klt.klt_track(pi, gi, pj, uv, jnp.ones(2, bool), levels=(2, 1, 0))
        assert not bool(valid[0]) or bool(np.linalg.norm(np.asarray(out[0]) - [2, 2]) < 2)
        assert bool(valid[1])
