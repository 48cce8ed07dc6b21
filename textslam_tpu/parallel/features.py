"""Data-parallel batched feature extraction over a device mesh.

The 'DP' component of SURVEY.md §2.4: the reference extracts ORB serially per
frame (src/ORBextractor.cc); here a batch of frames is vmapped through the
whole extractor and sharded over devices — each chip processes its slice of
the batch independently (no collectives needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import orb


def batched_extract(imgs: jnp.ndarray, mesh: Mesh, n_features: int = 1000, n_levels: int = 8):
    """Extract ORB keypoints for a batch of frames, sharded over the mesh.

    imgs [B, H, W] with B divisible by the mesh size. Returns a Keypoints
    pytree with a leading batch axis, sharded along the data axis."""
    axis = mesh.axis_names[0]

    @functools.partial(
        shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
    )
    def run(shard):
        return jax.vmap(
            lambda im: orb.extract_orb(im, n_features=n_features, n_levels=n_levels)
        )(shard)

    return run(imgs)
