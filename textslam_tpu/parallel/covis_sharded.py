"""Keyframe-axis-sharded covisibility products (SURVEY.md §2.4 "map
sharding" row; §5 long-context analog).

The reference keeps covisibility as dense K x K int matrices rebuilt from
observation lists (src/map.h:81-85, src/map.cc:20-28). Here the rebuild is
an incidence-matrix product M = inc @ inc.T (mapper/state.py), and this
module provides the device-mesh version: the keyframe axis of the incidence
matrix is sharded across devices, each device contracts its row block
against the gathered opposite operand on the MXU, and the result arrives
row-sharded (gathered to the host for the numpy-resident M matrices).

Counts are exact in f32 (shared-landmark counts are far below 2^24), so the
contraction runs as a plain MXU matmul instead of an integer path.

Scale guidance (measured, see PARITY.md "map-axis sharding"): at the
default pool caps (512 KFs x 32768 points) the host-side product is
~milliseconds — the device path exists for maps beyond the single-host
regime and as the mechanism demanded by the blueprint, and it engages when
`ParallelConfig.covis_devices > 1` and the map is large enough to amortize
the transfer (`covis_min_kfs`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int) -> Mesh:
    return Mesh(np.asarray(jax.devices()[:n_devices]), ("kf",))


@functools.partial(jax.jit, static_argnames=("mesh",))
def _self_product(inc_u8, mesh: Mesh):
    """M = inc @ inc.T with the left operand row-sharded over the kf axis.

    The incidence arrives as uint8 (host->device transfer is the dominant
    cost; bools packed as bytes quarter it vs f32) and widens on device.
    XLA lowers the contraction to per-shard MXU matmuls over the replicated
    right operand and leaves the K x K result row-sharded (no psum needed:
    the contraction axis P is unsharded)."""
    inc = inc_u8.astype(jnp.float32)
    inc_sh = jax.lax.with_sharding_constraint(
        inc, NamedSharding(mesh, P("kf", None)))
    out = inc_sh @ inc.T
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("kf", None)))


@functools.partial(jax.jit, static_argnames=("mesh",))
def _weighted_product(inc_u8, w, mesh: Mesh):
    """Mw = (inc * w) @ inc.T (the M3 form: per-landmark feature weights)."""
    inc = inc_u8.astype(jnp.float32)
    inc_sh = jax.lax.with_sharding_constraint(
        inc, NamedSharding(mesh, P("kf", None)))
    out = (inc_sh * w[None, :]) @ inc.T
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P("kf", None)))


def _pad_rows(a: np.ndarray, mult: int) -> np.ndarray:
    K = a.shape[0]
    pad = (-K) % mult
    if pad == 0:
        return a
    return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))


def covis_product(inc: np.ndarray, mesh: Mesh,
                  w: np.ndarray | None = None) -> np.ndarray:
    """Sharded M = inc @ inc.T (or (inc*w) @ inc.T), zero diagonal.

    inc [K, n] bool observation incidence; w [n] optional int weights.
    Returns int32 [K, K], bit-identical to the host product."""
    K = inc.shape[0]
    n_dev = mesh.devices.size
    inc_u8 = _pad_rows(inc.astype(np.uint8), n_dev)
    if w is None:
        out = _self_product(jnp.asarray(inc_u8), mesh)
    else:
        out = _weighted_product(jnp.asarray(inc_u8), jnp.asarray(
            w.astype(np.float32)), mesh)
    M = np.asarray(out)[:K, :K].astype(np.int32)
    np.fill_diagonal(M, 0)
    return M
