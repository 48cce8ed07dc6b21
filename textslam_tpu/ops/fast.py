"""Dense FAST-9/16 corner detection as batched array ops.

The reference runs OpenCV-style per-cell FAST with threshold fallback 20→7 and
then redistributes keypoints with a serial quad-tree
(src/ORBextractor.cc:540,810-816). A serial tree is hostile to TPUs; instead we
compute the FAST corner *score* densely for the whole level in one fused pass
(16 shifted comparisons + circular-arc reduction on the VPU), 3x3 NMS, then do
per-grid-cell top-k selection (ops.orb.select_grid_topk) — same spatial
uniformity semantics, fully parallel.

Score definition: the classical "maximal threshold for which the pixel stays a
corner" = max over the 16 contiguous 9-arcs of the min absolute center
difference within the arc (computed for bright and dark arcs separately).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, OpenCV ordering (start top, clockwise)
CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)

ARC = 9  # FAST-9/16


def _shifted(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """img sampled at (x+dx, y+dy) with zero padding (borders are masked out
    by the radius-3 validity margin anyway)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


@functools.partial(jax.jit, static_argnames=())
def fast_score_map(img: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel FAST-9 corner score [H, W]; 0 where not a corner at
    `threshold`. Border of 3px is zeroed."""
    H, W = img.shape
    center = img
    ring = jnp.stack([_shifted(img, int(dx), int(dy)) for dx, dy in CIRCLE])  # [16,H,W]
    dpos = ring - center[None]  # brighter by d
    dneg = center[None] - ring  # darker by d

    def arc_score(d):
        # for each start k: min over the 9-arc of d, then max over k; >threshold => corner
        d2 = jnp.concatenate([d, d[: ARC - 1]], axis=0)  # wraparound [24,H,W]
        # windowed min via iterative pairwise mins (log steps over width 9)
        m = d2
        m = jnp.minimum(m[:-1], m[1:])          # width 2
        m = jnp.minimum(m[:-2], m[2:])          # width 4
        m = jnp.minimum(m[:-4], m[4:])          # width 8
        m = jnp.minimum(m[:-1], m[1:])          # width 9
        return m[:16].max(axis=0)  # [H,W]

    score = jnp.maximum(arc_score(dpos), arc_score(dneg))
    score = jnp.where(score > threshold, score, 0.0)
    # zero the 3px border
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(inb, score, 0.0)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: keep score only at local maxima."""
    H, W = score.shape
    p = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    neigh = jnp.stack(
        [
            p[dy : dy + H, dx : dx + W]
            for dy in range(3)
            for dx in range(3)
            if not (dy == 1 and dx == 1)
        ]
    )
    is_max = score >= neigh.max(axis=0)
    return jnp.where(is_max, score, 0.0)
