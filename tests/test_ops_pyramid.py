import numpy as np
import jax.numpy as jnp
import cv2

from textslam_tpu.ops import pyramid, interp

RNG = np.random.default_rng(1)


def make_img(h=96, w=128):
    img = RNG.uniform(0, 255, size=(h, w)).astype(np.float32)
    return cv2.GaussianBlur(img, (5, 5), 1.5)


class TestPyramid:
    def test_pyrdown_matches_cv2(self):
        img = make_img()
        got = np.array(pyramid.pyr_down(jnp.asarray(img)))
        want = cv2.pyrDown(img)
        # interior agrees exactly modulo float assoc; borders share REFLECT_101
        np.testing.assert_allclose(got, want, atol=1e-2)

    def test_build_pyramid_shapes(self):
        img = jnp.asarray(make_img(96, 128))
        imgs, grads = pyramid.build_pyramid(img, levels=5)
        assert len(imgs) == 5 and len(grads) == 5
        assert imgs[0].shape == (96, 128)
        assert imgs[1].shape == (48, 64)
        assert imgs[4].shape == (6, 8)
        assert grads[0].shape == (96, 128, 2)

    def test_sobel_matches_cv2(self):
        img = make_img()
        gx, gy = pyramid.sobel(jnp.asarray(img))
        wx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3)
        wy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3)
        np.testing.assert_allclose(np.array(gx), wx, atol=1e-2)
        np.testing.assert_allclose(np.array(gy), wy, atol=1e-2)

    def test_pack_pyramid(self):
        img = jnp.asarray(make_img(64, 96))
        imgs, grads = pyramid.build_pyramid(img, levels=3)
        packed = pyramid.pack_pyramid(imgs, grads)
        assert packed["data"].shape == (3, 64, 96, 3)
        np.testing.assert_array_equal(np.array(packed["shapes"]), [[64, 96], [32, 48], [16, 24]])
        np.testing.assert_allclose(np.array(packed["data"][1, :32, :48, 0]), np.array(imgs[1]), atol=1e-6)
        assert float(jnp.abs(packed["data"][1, 32:, :, 0]).max()) == 0.0


class TestBilinear:
    def test_exact_on_grid(self):
        img = jnp.asarray(make_img(32, 40))
        uv = jnp.array([[3.0, 5.0], [10.0, 2.0]])
        vals, mask = interp.bilinear(img, uv)
        np.testing.assert_allclose(np.array(vals), [float(img[5, 3]), float(img[2, 10])], atol=1e-5)
        assert bool(mask.all())

    def test_matches_cv2_remap(self):
        img = make_img(48, 64)
        uv = np.stack(
            [RNG.uniform(1, 62, size=200), RNG.uniform(1, 46, size=200)], axis=-1
        ).astype(np.float32)
        vals, mask = interp.bilinear(jnp.asarray(img), jnp.asarray(uv))
        want = cv2.remap(
            img, uv[None, :, 0], uv[None, :, 1], interpolation=cv2.INTER_LINEAR
        )[0]
        np.testing.assert_allclose(np.array(vals), want, atol=1e-3)
        assert bool(mask.all())

    def test_out_of_bounds_masked(self):
        img = jnp.asarray(make_img(32, 32))
        uv = jnp.array([[-1.0, 5.0], [5.0, 33.0], [31.0, 31.0]])
        vals, mask = interp.bilinear(img, uv)
        assert list(np.array(mask)) == [False, False, True]
        assert float(vals[0]) == 0.0 and float(vals[1]) == 0.0

    def test_multichannel_and_packed(self):
        img = jnp.asarray(make_img(32, 32))
        imgs, grads = pyramid.build_pyramid(img, levels=2)
        packed = pyramid.pack_pyramid(imgs, grads)
        i, gx, gy, m = interp.bilinear_packed(
            packed["data"], packed["shapes"], 1, jnp.array([[4.5, 6.5]])
        )
        want, _ = interp.bilinear(imgs[1], jnp.array([[4.5, 6.5]]))
        np.testing.assert_allclose(np.array(i), np.array(want), atol=1e-5)
        # beyond level-1 extent -> masked
        _, _, _, m2 = interp.bilinear_packed(
            packed["data"], packed["shapes"], 1, jnp.array([[20.0, 5.0]])
        )
        assert not bool(m2[0])
