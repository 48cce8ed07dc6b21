import numpy as np

from textslam_tpu import native
from textslam_tpu.ops import levenshtein as lev_jax


class TestNative:
    def test_built(self):
        # the toolchain is baked into the image; the extension must build
        assert native.HAVE_NATIVE

    def test_levenshtein_matches_jax(self):
        words_a = ["kitten", "flaw", "saturday", "", "你好世界"]
        words_b = ["sitting", "lawn", "sunday", "你好"]
        L = 12
        a, alen = lev_jax.encode(words_a, L)
        b, blen = lev_jax.encode(words_b, L)
        got = native.levenshtein_batch(a, alen, b, blen)
        import jax.numpy as jnp

        want = np.asarray(lev_jax.levenshtein_matrix(
            jnp.asarray(a), jnp.asarray(alen), jnp.asarray(b), jnp.asarray(blen)))
        np.testing.assert_array_equal(got, want)

    def test_covis_product(self):
        rng = np.random.default_rng(0)
        inc = rng.random((12, 500)) < 0.2
        got = native.covis_product(inc)
        want = inc.astype(np.int32) @ inc.astype(np.int32).T
        np.fill_diagonal(want, 0)
        np.testing.assert_array_equal(got, want)
        assert (got == got.T).all()

    def test_prefetcher(self, tmp_path):
        paths = []
        for i in range(20):
            p = tmp_path / f"f{i}.bin"
            p.write_bytes(bytes([i]) * (100 + i))
            paths.append(str(p))
        pf = native.Prefetcher(paths, lookahead=4)
        # out-of-order and repeated access
        for i in [0, 3, 1, 5, 19, 10]:
            data = pf.get(i)
            assert data == bytes([i]) * (100 + i)
