import numpy as np
import jax.numpy as jnp

from textslam_tpu.ops import rasterize, zncc, levenshtein

RNG = np.random.default_rng(6)


class TestRasterize:
    def test_quad_mask_square(self):
        quad = jnp.array([[2.0, 2.0], [7.0, 2.0], [7.0, 7.0], [2.0, 7.0]])
        m = np.array(rasterize.quad_mask(quad, 10, 10))
        assert m[4, 4] and m[2, 2] and m[7, 7]
        assert not m[1, 4] and not m[4, 8] and not m[9, 9]

    def test_quad_mask_winding(self):
        q_ccw = jnp.array([[2.0, 2.0], [2.0, 7.0], [7.0, 7.0], [7.0, 2.0]])
        m = np.array(rasterize.quad_mask(q_ccw, 10, 10))
        assert m[4, 4]

    def test_point_in_quad(self):
        quad = jnp.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
        pts = jnp.array([[2.0, 2.0], [5.0, 2.0], [-1.0, 0.0]])
        got = np.array(rasterize.point_in_quad(pts, quad))
        assert list(got) == [True, False, False]

    def test_quad_stats(self):
        img = jnp.asarray(RNG.uniform(0, 255, (32, 32)).astype(np.float32))
        quad = jnp.array([[4.0, 4.0], [20.0, 4.0], [20.0, 16.0], [4.0, 16.0]])
        mu, sigma, n = rasterize.quad_stats(img, quad)
        sub = np.array(img)[4:17, 4:21]
        np.testing.assert_allclose(float(mu), sub.mean(), rtol=1e-5)
        np.testing.assert_allclose(float(sigma), sub.std(), rtol=1e-5)
        assert int(n) == sub.size

    def test_label_lookup(self):
        quads = jnp.array([
            [[0.0, 0.0], [10, 0], [10, 10], [0, 10]],
            [[20.0, 20], [30, 20], [30, 30], [20, 30]],
        ])
        pts = jnp.array([[5.0, 5.0], [25.0, 25.0], [15.0, 15.0]])
        lab = np.array(rasterize.label_lookup(quads, jnp.array([True, True]), pts))
        assert list(lab) == [0, 1, -1]
        lab2 = np.array(rasterize.label_lookup(quads, jnp.array([False, True]), pts))
        assert list(lab2) == [-1, 1, -1]


class TestZNCC:
    def test_identical_is_one(self):
        a = jnp.asarray(RNG.normal(size=(50,)).astype(np.float32))
        v = jnp.ones(50, bool)
        assert abs(float(zncc.zncc(a, a * 2.0 + 3.0, v)) - 1.0) < 1e-5

    def test_uncorrelated_near_zero(self):
        a = jnp.asarray(RNG.normal(size=(500,)).astype(np.float32))
        b = jnp.asarray(RNG.normal(size=(500,)).astype(np.float32))
        assert abs(float(zncc.zncc(a, b, jnp.ones(500, bool)))) < 0.15

    def test_masked(self):
        a = jnp.asarray(RNG.normal(size=(50,)).astype(np.float32))
        b = a.at[25:].set(99.0)  # corrupt masked-out half
        v = jnp.arange(50) < 25
        assert abs(float(zncc.zncc(a, b, v)) - 1.0) < 1e-5


def _py_lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        new = [i + 1]
        for j, cb in enumerate(b):
            new.append(min(dp[j + 1] + 1, new[-1] + 1, dp[j] + (ca != cb)))
        dp = new
    return dp[-1]


class TestLevenshtein:
    def test_matches_python(self):
        words_a = ["kitten", "flaw", "saturday", "", "abc", "exit"]
        words_b = ["sitting", "lawn", "sunday", "xyz", "abc"]
        L = 12
        a, alen = levenshtein.encode(words_a, L)
        b, blen = levenshtein.encode(words_b, L)
        d = np.array(levenshtein.levenshtein_matrix(
            jnp.asarray(a), jnp.asarray(alen), jnp.asarray(b), jnp.asarray(blen)))
        for i, wa in enumerate(words_a):
            for j, wb in enumerate(words_b):
                assert d[i, j] == _py_lev(wa, wb), (wa, wb, d[i, j])

    def test_unicode(self):
        words_a = ["你好世界", "日本語"]
        words_b = ["你好", "日本語テスト"]
        L = 8
        a, alen = levenshtein.encode(words_a, L)
        b, blen = levenshtein.encode(words_b, L)
        d = np.array(levenshtein.levenshtein_matrix(
            jnp.asarray(a), jnp.asarray(alen), jnp.asarray(b), jnp.asarray(blen)))
        assert d[0, 0] == 2  # delete 世界
        assert d[1, 1] == 3  # insert テスト

    def test_scores(self):
        words = ["hello"]
        a, alen = levenshtein.encode(words, 8)
        b, blen = levenshtein.encode(["hello", "help"], 8)
        d = levenshtein.levenshtein_matrix(jnp.asarray(a), jnp.asarray(alen), jnp.asarray(b), jnp.asarray(blen))
        s = np.array(levenshtein.similarity_scores(d, jnp.asarray(alen), jnp.asarray(blen)))
        assert s[0, 0] == 1.0
        np.testing.assert_allclose(s[0, 1], (5 - 2) / 5)


class TestLevenshteinCJK:
    """CJK strings flow through the whole Levenshtein path as codepoints
    (VERDICT r1 item 5): one character edit = one unit of distance, so CJK
    and Latin words score on the same scale. (The reference compares BYTES,
    src/tool.cc:264-299 — a CJK char difference costs up to 3 there.)"""

    def test_cjk_character_edits(self):
        words_a = ["北京饭店", "出口", "小心地滑"]
        words_b = ["北京饭店", "出囗", "小心地滑了", "EXIT"]
        L = 16
        a, alen = levenshtein.encode(words_a, L)
        b, blen = levenshtein.encode(words_b, L)
        d = np.array(levenshtein.levenshtein_matrix(
            jnp.asarray(a), jnp.asarray(alen), jnp.asarray(b), jnp.asarray(blen)))
        assert d[0, 0] == 0            # identical
        assert d[1, 1] == 1            # 口 vs 囗: ONE codepoint substitution
        assert d[2, 2] == 1            # one char appended
        assert d[0, 3] == 4            # totally different: all substituted
        s = np.array(levenshtein.similarity_scores(
            jnp.asarray(d), jnp.asarray(alen), jnp.asarray(blen)))
        assert s[0, 0] == 1.0
        assert abs(s[1, 1] - 0.5) < 1e-6   # (2-1)/2
        assert abs(s[2, 2] - 0.8) < 1e-6   # (5-1)/5

    def test_mixed_script(self):
        words_a = ["Café北京"]
        words_b = ["Cafe北京"]
        L = 16
        a, alen = levenshtein.encode(words_a, L)
        b, blen = levenshtein.encode(words_b, L)
        d = np.array(levenshtein.levenshtein_matrix(
            jnp.asarray(a), jnp.asarray(alen), jnp.asarray(b), jnp.asarray(blen)))
        assert d[0, 0] == 1  # é vs e


class TestBatchedThetaOptimize:
    """fused_theta_optimize_all must reproduce per-object
    fused_theta_optimize (theta-only normal equations are block-diagonal, so
    the batched per-object LM schedule is N independent solves)."""

    def _make_case(self, seed, theta_gt):
        import jax
        import jax.numpy as jnp
        from textslam_tpu.geometry import se3, plane
        from textslam_tpu.geometry.camera import unproject, project
        from textslam_tpu.ops import pyramid
        from textslam_tpu.frontend.text import extract_text_features

        rng = np.random.default_rng(seed)
        H, W = 120, 160
        fx = fy = 150.0
        cx, cy = W / 2, H / 2
        # smooth textured host image
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        img_h = (128 + 60 * np.sin(xx / 7.0 + seed) * np.cos(yy / 9.0)
                 + 40 * np.sin((xx + 2 * yy) / 13.0)).astype(np.float32)
        T_host = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))
        tvec = np.array([0.04, -0.02, 0.01], np.float32)
        T_tgt = jnp.asarray(np.concatenate(
            [np.array([1, 0, 0, 0], np.float32), tvec]))
        # target image rendered by warping through the GT plane
        uvt = np.stack(np.meshgrid(np.arange(W), np.arange(H)), -1).astype(np.float32)
        rays_t = unproject(jnp.asarray(uvt.reshape(-1, 2)), fx, fy, cx, cy)
        # target ray -> world (target=T_tgt) -> host pixel via plane in host:
        # solve depth along target ray from plane in host coords
        T_ht = se3.compose(T_host, se3.inverse(T_tgt))
        from textslam_tpu.geometry.quaternion import qto_matrix
        R = np.asarray(qto_matrix(T_ht[:4]))
        t = np.asarray(T_ht[4:7])
        rt = np.asarray(rays_t)
        denom = -(rt @ R.T) @ np.asarray(theta_gt) * 1.0
        # host point p_h = R (z * ray_t) + t with -theta . p_h = 1 (scaled):
        # -theta.(R z r + t) ... solve z: z * (-theta.R r) = 1 + theta.t
        z = (1.0 + np.asarray(theta_gt) @ t) / np.where(
            np.abs(denom) > 1e-9, denom, 1e-9)
        p_h = (z[:, None] * rt) @ R.T + t
        uv_h = np.asarray(project(jnp.asarray(p_h.astype(np.float32)),
                                  fx, fy, cx, cy)).reshape(H, W, 2)
        xi = np.clip(uv_h[..., 0], 0, W - 1.001)
        yi = np.clip(uv_h[..., 1], 0, H - 1.001)
        x0, y0 = xi.astype(int), yi.astype(int)
        wx, wy = xi - x0, yi - y0
        img_t = ((1 - wx) * (1 - wy) * img_h[y0, x0]
                 + wx * (1 - wy) * img_h[y0, np.minimum(x0 + 1, W - 1)]
                 + (1 - wx) * wy * img_h[np.minimum(y0 + 1, H - 1), x0]
                 + wx * wy * img_h[np.minimum(y0 + 1, H - 1),
                                   np.minimum(x0 + 1, W - 1)]).astype(np.float32)

        def packed(img):
            imgs, grads = pyramid.build_pyramid(jnp.asarray(img), levels=4)
            return [jnp.concatenate([imgs[l][..., None], grads[l]], -1)
                    for l in range(4)]

        pk_h, pk_t = packed(img_h), packed(img_t)
        quad = np.array([[40, 30], [120, 30], [120, 90], [40, 90]], np.float32)
        from textslam_tpu.ops import rasterize

        F = 24
        feat_uv = np.zeros((4, F, 2), np.float32)
        feat_ref = np.zeros((4, F, 8), np.float32)
        feat_valid = np.zeros((4, F), bool)
        for l in range(4):
            s = 2.0 ** l
            mu, sg, _ = rasterize.quad_stats(pk_h[l][..., 0],
                                             jnp.asarray(quad / s))
            uv, ref, val = extract_text_features(
                pk_h[l][..., 0], pk_h[l][..., 1:3], jnp.asarray(quad / s),
                mu, sg, F)
            feat_uv[l], feat_ref[l], feat_valid[l] = (
                np.asarray(uv), np.asarray(ref), np.asarray(val))
        return dict(fx=fx, fy=fy, cx=cx, cy=cy, quad=quad,
                    T_host=np.asarray(T_host), T_tgt=np.asarray(T_tgt),
                    pk_t=pk_t, feat_uv=feat_uv, feat_ref=feat_ref,
                    feat_valid=feat_valid)

    def test_batch_matches_single(self):
        import jax.numpy as jnp
        from textslam_tpu.frontend.text import (fused_theta_optimize,
                                                fused_theta_optimize_all)

        theta_gt = np.array([0.02, -0.01, -0.55], np.float32)
        cases = [self._make_case(s, theta_gt) for s in (0, 1)]
        theta0 = np.array([0.0, 0.0, -0.5], np.float32)
        levels, n_it = (2, 1, 0), 6
        singles = []
        for c in cases:
            K = 4
            poses = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (K, 1))
            poses[0] = c["T_tgt"]
            tgt_valid = np.zeros(K, bool)
            tgt_valid[0] = True
            fvk = np.zeros((K, 4, 24), bool)
            fvk[0] = c["feat_valid"]
            imgs_levels = tuple(
                jnp.stack([c["pk_t"][l]] * K) for l in levels)
            th, H = fused_theta_optimize(
                jnp.asarray(theta0), jnp.asarray(poses), jnp.asarray(tgt_valid),
                jnp.asarray(c["T_host"]), jnp.asarray(c["quad"]),
                jnp.asarray(c["feat_uv"]), jnp.asarray(c["feat_ref"]),
                jnp.asarray(fvk), imgs_levels,
                c["fx"], c["fy"], c["cx"], c["cy"],
                levels=levels, n_iters=n_it, huber_theta=2.0, weight_text=5.0)
            singles.append(np.asarray(th))

        # batched: both cases in one program (each with its own target image)
        N, Kt, M = 4, 4, 4
        theta0_b = np.tile(theta0, (N, 1))
        host_poses = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (N, 1))
        quads = np.zeros((N, 4, 2), np.float32)
        poses_b = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (M, 1))
        tgt_img = np.zeros((N, Kt), np.int32)
        tgt_valid_b = np.zeros((N, Kt), bool)
        obj_valid = np.zeros(N, bool)
        feat_uv_b = np.zeros((N, 4, 24, 2), np.float32)
        feat_ref_b = np.zeros((N, 4, 24, 8), np.float32)
        fvk_b = np.zeros((N, Kt, 4, 24), bool)
        for i, c in enumerate(cases):
            quads[i] = c["quad"]
            poses_b[i] = c["T_tgt"]
            tgt_img[i, 0] = i
            tgt_valid_b[i, 0] = True
            obj_valid[i] = True
            feat_uv_b[i] = c["feat_uv"]
            feat_ref_b[i] = c["feat_ref"]
            fvk_b[i, 0] = c["feat_valid"]
        imgs_levels_b = tuple(
            jnp.stack([cases[0]["pk_t"][l], cases[1]["pk_t"][l]]
                      + [jnp.zeros_like(cases[0]["pk_t"][l])] * (M - 2))
            for l in levels)
        th_b, H_b, cost_b = fused_theta_optimize_all(
            jnp.asarray(theta0_b), jnp.asarray(host_poses), jnp.asarray(quads),
            jnp.asarray(poses_b), jnp.asarray(tgt_img), jnp.asarray(tgt_valid_b),
            jnp.asarray(obj_valid),
            jnp.asarray(feat_uv_b), jnp.asarray(feat_ref_b), jnp.asarray(fvk_b),
            imgs_levels_b,
            cases[0]["fx"], cases[0]["fy"], cases[0]["cx"], cases[0]["cy"],
            levels=levels, n_iters=n_it, huber_theta=2.0, weight_text=5.0)
        th_b = np.asarray(th_b)
        for i in range(2):
            # both solvers converge toward GT...
            assert np.linalg.norm(th_b[i] - theta_gt) < np.linalg.norm(
                theta0 - theta_gt), f"case {i} did not improve"
            # ...and agree with each other
            np.testing.assert_allclose(th_b[i], singles[i], rtol=0, atol=2e-3)
