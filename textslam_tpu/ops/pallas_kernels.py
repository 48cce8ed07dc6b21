"""Hand-written Pallas TPU kernels for ops where XLA's default lowering
leaves throughput on the table (SURVEY.md §7.2 M7: FAST, irregular gathers,
Hamming matcher, Levenshtein are the expected candidates).

Currently: the tiled Hamming distance matrix. The dense [N1, N2] popcount
reduction is the inner loop of every matcher call (SearchFrom3D, two-view
init, triangulation search, loop-closing correspondence). The Pallas version
tiles both descriptor sets through VMEM and keeps the XOR+popcount+reduce
entirely on the VPU with explicit [128, 128] blocking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at lowering time; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

TILE = 128


def _hamming_kernel(d1_ref, d2_ref, out_ref):
    """One [TILE, TILE] output block: popcount(xor) accumulated word by word.

    Descriptors arrive transposed as [8, TILE] uint32 so the 128-wide lane
    dimension is the descriptor index (native (8, 128) uint32 tiling); the
    word loop keeps the working set at one [TILE, TILE] register tile instead
    of a [TILE, TILE, 8] VMEM intermediate."""
    acc = jnp.zeros((TILE, TILE), jnp.int32)
    for w in range(d1_ref.shape[0]):
        x = jnp.bitwise_xor(d1_ref[w, :][:, None], d2_ref[w, :][None, :])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=())
def hamming_matrix_pallas(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances [N1, N2] via a tiled Pallas kernel.

    Pads both sets to TILE multiples (masked rows yield garbage distances in
    the padded region — callers already mask by validity)."""
    N1, W = d1.shape
    N2 = d2.shape[0]
    P1 = (N1 + TILE - 1) // TILE * TILE
    P2 = (N2 + TILE - 1) // TILE * TILE
    d1t = jnp.pad(d1, ((0, P1 - N1), (0, 0))).T  # [W, P1]
    d2t = jnp.pad(d2, ((0, P2 - N2), (0, 0))).T  # [W, P2]
    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((P1, P2), jnp.int32),
        grid=(P1 // TILE, P2 // TILE),
        in_specs=[
            pl.BlockSpec((W, TILE), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(d1t, d2t)
    return out[:N1, :N2]
