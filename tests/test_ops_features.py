import numpy as np
import jax.numpy as jnp
import cv2
import pytest

from textslam_tpu.ops import fast, orb, matching

RNG = np.random.default_rng(2)


def checkerboard(h=120, w=160, sq=12):
    """High-texture synthetic image with known corners."""
    y, x = np.mgrid[0:h, 0:w]
    img = (((y // sq) + (x // sq)) % 2 * 200.0 + 20).astype(np.float32)
    return img


def textured(h=120, w=160):
    img = RNG.uniform(0, 255, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    img -= img.min()
    return img * (255.0 / img.max())


class TestFAST:
    def test_detects_square_corners(self):
        # L-junctions are FAST-9 corners (X-junctions of a checkerboard are
        # not: 8 bright/8 dark never gives 9 contiguous)
        img = np.zeros((40, 40), np.float32)
        img[10:30, 10:30] = 200.0
        smap = np.array(fast.nms3(fast.fast_score_map(jnp.asarray(img), 20.0)))
        ys, xs = np.nonzero(smap > 0)
        pts = set(zip(ys, xs))
        for corner in [(10, 10), (10, 29), (29, 10), (29, 29)]:
            assert any(abs(p[0] - corner[0]) <= 1 and abs(p[1] - corner[1]) <= 1 for p in pts)

    def test_agrees_with_cv2_on_strong_corners(self):
        img = np.round(textured()).clip(0, 255).astype(np.uint8).astype(np.float32)
        # compare raw detections (pre-NMS): NMS tie-breaking differs from cv2's
        smap = np.array(fast.fast_score_map(jnp.asarray(img), 20.0))
        ours = set(zip(*np.nonzero(smap > 0)))
        det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
        kps = det.detect(img.astype(np.uint8))
        cv_pts = [(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps]
        cv_pts = [p for p in cv_pts if 5 <= p[0] < img.shape[0] - 5 and 5 <= p[1] < img.shape[1] - 5]
        if not cv_pts:
            pytest.skip("cv2 found no corners on this texture")
        # most cv2 corners should be within 2px of one of ours
        hits = 0
        for (r, c) in cv_pts:
            if smap[max(0, r - 2) : r + 3, max(0, c - 2) : c + 3].max() > 0:
                hits += 1
        assert hits / len(cv_pts) > 0.8

    def test_no_corners_on_flat(self):
        img = jnp.full((64, 64), 100.0)
        smap = fast.fast_score_map(img, 10.0)
        assert float(smap.max()) == 0.0


class TestSelect:
    def test_spatial_uniformity(self):
        img = textured(128, 128)
        smap = fast.nms3(fast.fast_score_map(jnp.asarray(img), 10.0))
        uv, sc, valid = orb.select_keypoints(smap, 64, cell=32)
        uv = np.array(uv)[np.array(valid)]
        # every 32px cell with corners should have a selected keypoint
        occupied = set()
        for u, v in uv:
            occupied.add((int(v) // 32, int(u) // 32))
        n_cells_with_corners = 0
        s = np.array(smap)
        for cy in range(4):
            for cx in range(4):
                if s[cy * 32 : (cy + 1) * 32, cx * 32 : (cx + 1) * 32].max() > 0:
                    n_cells_with_corners += 1
        assert len(occupied) >= 0.9 * n_cells_with_corners


class TestORB:
    def test_extract_shapes_and_validity(self):
        img = jnp.asarray(textured(240, 320))
        kp = orb.extract_orb(img, n_features=500, n_levels=4)
        n = kp.uv.shape[0]
        assert kp.desc.shape == (n, 8)
        assert bool(kp.valid.any())
        uv = np.array(kp.uv)[np.array(kp.valid)]
        assert (uv[:, 0] < 320 * 1.0).all() and (uv[:, 1] < 240 * 1.0).all()

    def test_orientation_rotation_equivariance(self):
        # rotate image 90deg; angles should rotate accordingly for matched pts
        img = textured(128, 128)
        a1 = np.array(orb.ic_angle(jnp.asarray(img), jnp.array([[40.0, 40.0]])))[0]
        rot = np.rot90(img, k=-1).copy()  # 90 deg clockwise
        # point (40,40) maps to (127-40, 40) = (87, 40) in rotated image
        a2 = np.array(orb.ic_angle(jnp.asarray(rot), jnp.array([[127.0 - 40.0, 40.0]])))[0]
        d = (a2 - a1 - np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 0.15

    def test_descriptor_invariance_under_rotation(self):
        img = textured(160, 160)
        kp1 = orb.extract_orb(jnp.asarray(img), n_features=200, n_levels=1)
        rot = np.rot90(img, k=-1).copy()
        kp2 = orb.extract_orb(jnp.asarray(rot), n_features=200, n_levels=1)
        # match: for each kp1, find the rotated position and its nearest kp2
        uv1 = np.array(kp1.uv)
        uv2 = np.array(kp2.uv)
        v1 = np.array(kp1.valid)
        v2 = np.array(kp2.valid)
        d1 = np.array(kp1.desc)
        d2 = np.array(kp2.desc)
        expected = np.stack([159.0 - uv1[:, 1], uv1[:, 0]], -1)  # (u,v)->(H-1-v, u)
        dists = []
        for i in np.nonzero(v1)[0]:
            j = np.argmin(np.abs(uv2 - expected[i]).sum(-1) + 1e9 * (~v2))
            if np.abs(uv2[j] - expected[i]).max() <= 1.5:
                ham = bin(int.from_bytes(
                    (d1[i] ^ d2[j]).tobytes(), "little")).count("1")
                dists.append(ham)
        assert len(dists) > 20
        # rotated BRIEF should match well below the 256/2 chance level
        assert np.median(dists) < 64

    def test_determinism(self):
        img = jnp.asarray(textured(100, 100))
        k1 = orb.extract_orb(img, n_features=100, n_levels=2)
        k2 = orb.extract_orb(img, n_features=100, n_levels=2)
        np.testing.assert_array_equal(np.array(k1.desc), np.array(k2.desc))


class TestMatching:
    def test_hamming_matrix(self):
        d1 = jnp.asarray(RNG.integers(0, 2**32, (5, 8), dtype=np.uint32))
        d2 = d1.at[0, 0].set(d1[0, 0] ^ jnp.uint32(0b1011))
        H = np.array(matching.hamming_matrix(d1, d2))
        assert H[1, 1] == 0 and H[0, 0] == 3
        # symmetry against popcount ground truth
        gt = bin(int(d1[2, 3]) ^ int(d2[4, 3])).count("1")
        full = sum(bin(int(d1[2, k]) ^ int(d2[4, k])).count("1") for k in range(8))
        assert H[2, 4] == full

    def test_mutual_best_match_identity(self):
        d = jnp.asarray(RNG.integers(0, 2**32, (20, 8), dtype=np.uint32))
        valid = jnp.ones(20, dtype=bool)
        idx, ok = matching.mutual_best_match(d, d, valid, valid, max_dist=0)
        np.testing.assert_array_equal(np.array(idx)[np.array(ok)], np.arange(20)[np.array(ok)])
        assert bool(ok.all())

    def test_uniqueness(self):
        # two rows identical -> only one may claim the column
        d = jnp.asarray(RNG.integers(0, 2**32, (3, 8), dtype=np.uint32))
        d1 = jnp.concatenate([d[0:1], d[0:1], d[1:]], axis=0)  # rows 0,1 identical
        idx, ok = matching.mutual_best_match(d1, d, jnp.ones(4, bool), jnp.ones(3, bool), max_dist=0)
        claims = [int(i) for i, o in zip(np.array(idx), np.array(ok)) if o and i == 0]
        assert len(claims) <= 1

    def test_window_mask(self):
        uv1 = jnp.array([[0.0, 0.0], [50.0, 50.0]])
        uv2 = jnp.array([[5.0, 5.0], [100.0, 100.0]])
        m = np.array(matching.window_mask(uv1, uv2, 10.0))
        assert m[0, 0] and not m[0, 1] and not m[1, 0] and not m[1, 1]

    def test_rotation_histogram(self):
        n = 100
        a1 = jnp.asarray(RNG.uniform(0, 2 * np.pi, n).astype(np.float32))
        a2 = a1 - 0.3  # consistent rotation
        a2 = a2.at[:5].set(jnp.asarray(RNG.uniform(0, 2 * np.pi, 5)))  # outliers
        idx = jnp.arange(n)
        ok = jnp.ones(n, dtype=bool)
        ok2 = matching.rotation_histogram_filter(a1, a2, idx, ok)
        assert int(ok2[5:].sum()) > 90  # inliers survive


class TestPallasHamming:
    def test_matches_xla_in_interpret_mode(self):
        """The Pallas kernel must agree with the XLA path (interpret mode
        runs the kernel on CPU)."""
        from textslam_tpu.ops import pallas_kernels as pk
        import jax
        from jax.experimental import pallas as pl
        import jax.numpy as jnp

        d1 = jnp.asarray(RNG.integers(0, 2**32, (200, 8), dtype=np.uint32))
        d2 = jnp.asarray(RNG.integers(0, 2**32, (300, 8), dtype=np.uint32))
        # reference XLA computation
        x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
        want = np.asarray(jax.lax.population_count(x).astype(jnp.int32).sum(-1))

        T = pk.TILE
        P1 = (200 + T - 1) // T * T
        P2 = (300 + T - 1) // T * T
        d1t = jnp.pad(d1, ((0, P1 - 200), (0, 0))).T
        d2t = jnp.pad(d2, ((0, P2 - 300), (0, 0))).T
        out = pl.pallas_call(
            pk._hamming_kernel,
            out_shape=jax.ShapeDtypeStruct((P1, P2), jnp.int32),
            grid=(P1 // T, P2 // T),
            in_specs=[
                pl.BlockSpec((8, T), lambda i, j: (0, i)),
                pl.BlockSpec((8, T), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((T, T), lambda i, j: (i, j)),
            interpret=True,
        )(d1t, d2t)
        np.testing.assert_array_equal(np.asarray(out)[:200, :300], want)


class TestBoxORB:
    """In-box densification + boundary pruning (FeatExtracText +
    BoundFeatDele_T, src/frame.cc:232-244, src/tool.cc:456-509)."""

    def _textured(self, seed=0, H=160, W=240):
        rng = np.random.default_rng(seed)
        img = rng.uniform(0, 255, (H, W)).astype(np.float32)
        # checkerboard inside the box -> strong corners everywhere
        return img

    def test_keypoints_inside_shrunk_box(self):
        from textslam_tpu.ops import orb, rasterize

        img = self._textured()
        quads = np.zeros((4, 4, 2), np.float32)
        quads[0] = [[60, 40], [180, 40], [180, 100], [60, 100]]
        qvalid = np.zeros(4, bool)
        qvalid[0] = True
        kp = orb.extract_box_orb(jnp.asarray(img), jnp.asarray(quads),
                                 jnp.asarray(qvalid), n_keep=64, shrink=3.0)
        uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
        assert len(uv) > 10, "no in-box corners found"
        inq = np.asarray(rasterize.point_in_quad(jnp.asarray(uv), jnp.asarray(quads[0])))
        assert inq.all(), "keypoint escaped the box"
        # boundary prune: nothing within ~2.5px of the box edges
        d_left = uv[:, 0] - 60
        d_right = 180 - uv[:, 0]
        d_top = uv[:, 1] - 40
        d_bot = 100 - uv[:, 1]
        assert min(d_left.min(), d_right.min(), d_top.min(), d_bot.min()) >= 2.0

    def test_no_detections_no_keypoints(self):
        from textslam_tpu.ops import orb

        img = self._textured()
        quads = np.zeros((4, 4, 2), np.float32)
        qvalid = np.zeros(4, bool)
        kp = orb.extract_box_orb(jnp.asarray(img), jnp.asarray(quads),
                                 jnp.asarray(qvalid), n_keep=32)
        assert not bool(np.asarray(kp.valid).any())

    def test_frame_gains_box_features(self):
        from textslam_tpu.frontend.frame import build_frame, TextDetection
        from textslam_tpu.config import TextSLAMConfig, CameraConfig

        cfg = TextSLAMConfig(
            camera=CameraConfig(fx=200.0, fy=200.0, cx=120.0, cy=80.0,
                                width=240, height=160))
        img = self._textured()
        det = TextDetection(
            quad=np.array([[60, 40], [180, 40], [180, 100], [60, 100]], np.float32),
            text="HELLO", score=0.9)
        from textslam_tpu.frontend.frame import ensure_host_kp

        f_no = build_frame(cfg, img, 0, 0.0, detections=None, with_pyramid=False)
        f_yes = build_frame(cfg, img, 0, 0.0, detections=[det], with_pyramid=False)
        ensure_host_kp(f_no)
        ensure_host_kp(f_yes)
        assert f_yes.kp_uv.shape[0] == f_no.kp_uv.shape[0] + cfg.orb.n_box_features


class TestPackKeypoints:
    def test_roundtrip(self):
        """pack_keypoints -> unpack_keypoints_np is lossless (desc bits
        survive the f32 bitcast round-trip)."""
        from textslam_tpu.ops import orb

        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.random((128, 160), np.float32))
        kp = orb.extract_orb(img, n_features=64, n_levels=2)
        packed = np.asarray(orb.pack_keypoints(kp, kp))
        uv, level, angle, score, valid, desc = orb.unpack_keypoints_np(packed)
        n = int(kp.uv.shape[0])
        assert packed.shape == (2 * n, 14)
        np.testing.assert_allclose(uv[:n], np.asarray(kp.uv), atol=0)
        np.testing.assert_array_equal(level[:n], np.asarray(kp.level))
        np.testing.assert_allclose(angle[:n], np.asarray(kp.angle), atol=0)
        np.testing.assert_array_equal(valid[:n], np.asarray(kp.valid))
        np.testing.assert_array_equal(desc[:n], np.asarray(kp.desc))
        np.testing.assert_array_equal(desc[n:], np.asarray(kp.desc))
