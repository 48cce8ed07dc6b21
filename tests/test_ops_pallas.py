"""Pallas kernels, validated on CPU via interpret mode.

The TPU lowerings are exercised by bench.py on hardware; these tests pin the
kernel SEMANTICS (grouped region sampling == plain bilinear gathers wherever
the region covers the sample) so refactors can't silently change them.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from textslam_tpu.ops import pallas_kernels as pk
from textslam_tpu.ops.interp import bilinear_stack

RNG = np.random.default_rng(11)


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pk.pl, "pallas_call", patched)


class TestGroupedBilinear:
    def test_matches_plain_bilinear(self, interpret_pallas):
        K, H, W, C = 3, 64, 96, 3
        imgs = jnp.asarray(RNG.uniform(0, 255, (K, H, W, C)).astype(np.float32))
        G, Q = 5, 16
        group_k = jnp.asarray(RNG.integers(0, K, G).astype(np.int32))
        cx = RNG.uniform(10, W - 10, (G, 1))
        cy = RNG.uniform(10, H - 10, (G, 1))
        uv = np.stack(
            [cx + RNG.uniform(-8, 8, (G, Q)), cy + RNG.uniform(-8, 8, (G, Q))], -1
        ).astype(np.float32)
        uv[0, 0] = [-5.0, 3.0]  # off-image
        uv[1, 1] = [np.nan, np.nan]  # broken projection
        uv = jnp.asarray(uv)

        import jax

        # exact mode: must match plain bilinear to f32 accuracy
        vals, mask = pk.grouped_bilinear_stack(
            imgs, group_k, uv, region_h=32, region_w=64,
            precision=jax.lax.Precision.HIGHEST,
        )
        ref_vals, _ = bilinear_stack(imgs, group_k[:, None], uv)
        vals, mask, ref_vals = map(np.asarray, (vals, mask, ref_vals))
        assert not mask[0, 0] and not mask[1, 1]
        err = np.abs(vals - ref_vals)[mask]
        assert err.size and float(err.max()) < 1e-3
        # masked samples are exactly zero
        assert float(np.abs(vals[~mask]).max()) == 0.0
        # default mode: single-pass bf16, error bounded by value rounding
        vals2, mask2 = pk.grouped_bilinear_stack(
            imgs, group_k, uv, region_h=32, region_w=64
        )
        err2 = np.abs(np.asarray(vals2) - ref_vals)[np.asarray(mask2)]
        assert float(err2.max()) < 1.5  # 255 * 2^-8 + weight rounding

    def test_full_image_levels(self, interpret_pallas):
        """Small pyramid levels take the full-extent (origin 0) path."""
        K, H, W, C = 2, 24, 40, 3
        imgs = jnp.asarray(RNG.uniform(0, 255, (K, H, W, C)).astype(np.float32))
        G, Q = 3, 8
        group_k = jnp.asarray(RNG.integers(0, K, G).astype(np.int32))
        uv = jnp.asarray(
            np.stack([RNG.uniform(1, W - 2, (G, Q)), RNG.uniform(1, H - 2, (G, Q))], -1)
            .astype(np.float32)
        )
        import jax

        vals, mask = pk.grouped_bilinear_stack(
            imgs, group_k, uv, region_h=160, region_w=384,
            precision=jax.lax.Precision.HIGHEST,
        )
        ref_vals, ref_mask = bilinear_stack(imgs, group_k[:, None], uv)
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
        err = np.abs(np.asarray(vals) - np.asarray(ref_vals))[np.asarray(mask)]
        assert float(err.max()) < 1e-3

    def test_region_origin_alignment(self, interpret_pallas):
        """Origins snap to (8, 128)-aligned positions (Mosaic DMA contract)."""
        K, H, W, C = 1, 480, 640, 3
        imgs = jnp.asarray(RNG.uniform(0, 255, (K, H, W, C)).astype(np.float32))
        # cluster near the right/bottom edge to force clamping
        uv = jnp.asarray(
            np.stack([RNG.uniform(W - 60, W - 2, (1, 12)),
                      RNG.uniform(H - 60, H - 2, (1, 12))], -1).astype(np.float32)
        )
        import jax

        vals, mask = pk.grouped_bilinear_stack(
            imgs, jnp.zeros(1, jnp.int32), uv,
            precision=jax.lax.Precision.HIGHEST)
        ref_vals, _ = bilinear_stack(imgs, jnp.zeros((1, 1), jnp.int32), uv)
        assert bool(np.asarray(mask).all())
        err = np.abs(np.asarray(vals) - np.asarray(ref_vals))
        assert float(err.max()) < 1e-3


class TestHamming:
    def test_matches_numpy(self, interpret_pallas):
        d1 = RNG.integers(0, 2**32, (70, 8), dtype=np.uint32)
        d2 = RNG.integers(0, 2**32, (50, 8), dtype=np.uint32)
        got = np.asarray(pk.hamming_matrix_pallas(jnp.asarray(d1), jnp.asarray(d2)))
        x = d1[:, None, :] ^ d2[None, :, :]
        want = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
        np.testing.assert_array_equal(got, want)
