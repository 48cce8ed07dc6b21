"""Batched ORB feature extraction, TPU-first.

Reference behavior (src/ORBextractor.cc): 8-level 1.2x pyramid, per-cell FAST
with threshold fallback 20→7, quad-tree spatial redistribution
(DistributeOctTree), intensity-centroid orientation (IC_Angle), 7x7 Gaussian
blur then 256-bit BRIEF descriptors from the learned bit_pattern_31.

TPU re-design (same capability, parallel semantics):
- dense FAST score maps per level (ops.fast) at the *low* threshold — cells
  whose best corner is below the high threshold still contribute, which is
  exactly what the 20→7 fallback achieves;
- spatial uniformity via per-cell winner boosting + global top-k instead of a
  serial quad-tree: every non-empty cell's best corner is selected first,
  remaining slots fill with the globally strongest corners;
- orientation and descriptors as batched patch gathers (one [N,31,31] gather
  per level), everything under jit with static per-level keypoint counts;
- the BRIEF pattern is generated deterministically (seeded Gaussian pairs,
  classic BRIEF construction) — descriptors only need internal consistency,
  there is no cross-compatibility requirement with OpenCV bits.

Keypoint pools are padded SoA arrays with validity masks (SURVEY.md §7.3.1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fast
from .pyramid import _sep_conv2d_same

HALF_PATCH = 15
PATCH = 31


class Keypoints(NamedTuple):
    """Padded SoA keypoint set (level-0 pixel coordinates)."""

    uv: jnp.ndarray  # [N, 2] float32, level-0 coords
    uv_level: jnp.ndarray  # [N, 2] float32, coords at native level
    level: jnp.ndarray  # [N] int32
    angle: jnp.ndarray  # [N] float32 radians
    score: jnp.ndarray  # [N] float32
    desc: jnp.ndarray  # [N, 8] uint32 (256-bit BRIEF)
    valid: jnp.ndarray  # [N] bool


def _make_brief_pattern(seed: int = 7, n_bits: int = 256) -> np.ndarray:
    """Deterministic BRIEF-256 sampling pairs within the 31x31 patch.

    Classic BRIEF construction (Calonder et al.): pairs drawn i.i.d. from an
    isotropic Gaussian with sigma = patch/5, clipped to the patch. Seeded so
    every run/process produces identical descriptors (reference determinism:
    main.cpp:32 srand(0)).
    """
    rng = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 2, 2))
    pts = np.clip(np.round(pts), -(HALF_PATCH - 2), HALF_PATCH - 2)
    return pts.astype(np.float32)  # [256, 2(pair), 2(xy)]


BRIEF_PATTERN = _make_brief_pattern()

# circular-patch row extents for IC_Angle (u_max of a radius-15 disc per row)
_DY, _DX = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
CIRC_MASK = (_DX**2 + _DY**2 <= HALF_PATCH**2).astype(np.float32)  # [31,31]


def gauss_blur7(img: jnp.ndarray) -> jnp.ndarray:
    """7x7 Gaussian (sigma=2) applied before descriptor sampling
    (reference: src/ORBextractor.cc:1097)."""
    x = np.arange(-3, 4, dtype=np.float32)
    k = np.exp(-(x**2) / (2 * 2.0**2))
    k /= k.sum()
    return _sep_conv2d_same(img, k)


def select_keypoints(score: jnp.ndarray, n_keep: int, cell: int = 16):
    """Spatially-uniform top-k selection from a dense score map.

    Per-cell winners (computed with a reduce-window max) are boosted above all
    other scores, then a single global top_k picks boosted winners first and
    back-fills with the strongest remaining corners — the parallel equivalent
    of DistributeOctTree's "one per cell, then refine" policy.

    Returns (uv [n_keep, 2] float32, scores [n_keep], valid [n_keep]).
    """
    H, W = score.shape
    # pad to cell multiples
    Hp = (H + cell - 1) // cell * cell
    Wp = (W + cell - 1) // cell * cell
    sp = jnp.pad(score, ((0, Hp - H), (0, Wp - W)))
    cells = sp.reshape(Hp // cell, cell, Wp // cell, cell).transpose(0, 2, 1, 3)
    cell_max = cells.max(axis=(2, 3))  # [hc, wc]
    cell_max_b = jnp.repeat(jnp.repeat(cell_max, cell, axis=0), cell, axis=1)[:H, :W]
    is_winner = (score > 0) & (score >= cell_max_b)
    BIG = 1e6
    boosted = jnp.where(is_winner, score + BIG, score)
    flat = boosted.reshape(-1)
    vals, idx = jax.lax.top_k(flat, n_keep)
    vrow = idx // W
    ucol = idx - vrow * W
    uv = jnp.stack([ucol.astype(jnp.float32), vrow.astype(jnp.float32)], axis=-1)
    raw = jnp.where(vals > BIG / 2, vals - BIG, vals)
    valid = vals > 0
    return uv, raw, valid


def _gather_patches(img: jnp.ndarray, uv: jnp.ndarray, half: int = HALF_PATCH):
    """Gather [N, 2h+1, 2h+1] patches centered at integer uv. Patches that
    would leave the image are clamped (callers mask by border)."""
    H, W = img.shape
    u0 = jnp.round(uv[:, 0]).astype(jnp.int32).clip(half, W - 1 - half) - half
    v0 = jnp.round(uv[:, 1]).astype(jnp.int32).clip(half, H - 1 - half) - half

    def one(u, v):
        return jax.lax.dynamic_slice(img, (v, u), (2 * half + 1, 2 * half + 1))

    return jax.vmap(one)(u0, v0)


def ic_angle(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation over the radius-15 disc
    (reference IC_Angle, src/ORBextractor.cc:77). Batched: one patch gather,
    two masked moment reductions."""
    patches = _gather_patches(img, uv)  # [N, 31, 31]
    mask = jnp.asarray(CIRC_MASK)
    dx = jnp.asarray(_DX, dtype=jnp.float32)
    dy = jnp.asarray(_DY, dtype=jnp.float32)
    m10 = (patches * mask * dx).sum(axis=(1, 2))
    m01 = (patches * mask * dy).sum(axis=(1, 2))
    return jnp.arctan2(m01, m10)


def brief_descriptors(blurred: jnp.ndarray, uv: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF-256 (rBRIEF): rotate the pair pattern by the keypoint
    angle, nearest-sample the blurred image, compare, pack to uint32[8]."""
    pat = jnp.asarray(BRIEF_PATTERN)  # [256, 2, 2]
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    R = jnp.stack([jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], -2)  # [N,2,2]
    # rotated offsets: [N, 256, 2, 2]
    rot = jnp.einsum("nij,pqj->npqi", R, pat)
    pos = uv[:, None, None, :] + rot  # [N,256,2,2]
    H, W = blurred.shape
    ui = jnp.round(pos[..., 0]).astype(jnp.int32).clip(0, W - 1)
    vi = jnp.round(pos[..., 1]).astype(jnp.int32).clip(0, H - 1)
    samples = blurred[vi, ui]  # [N, 256, 2]
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint32)  # [N,256]
    words = bits.reshape(bits.shape[0], 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (words << shifts).sum(axis=-1).astype(jnp.uint32)  # [N, 8]


def _level_allocation(n_features: int, n_levels: int, scale: float) -> list:
    """Per-level keypoint budget, geometric in 1/scale
    (src/ORBextractor.cc ctor semantics)."""
    inv = 1.0 / scale
    total = (1 - inv**n_levels) / (1 - inv)
    base = n_features / total
    ns = [int(round(base * inv**l)) for l in range(n_levels)]
    ns[-1] = max(ns[-1], n_features - sum(ns[:-1]))
    return ns


@functools.partial(
    jax.jit, static_argnames=("n_features", "n_levels", "scale", "cell")
)
def extract_orb(
    img: jnp.ndarray,
    n_features: int = 1000,
    n_levels: int = 8,
    scale: float = 1.2,
    threshold: float = 7.0,
    cell: int = 16,
) -> Keypoints:
    """Full ORB extraction for one grayscale image [H, W] float32.

    Returns a padded Keypoints pool of size n_total (sum of per-level
    budgets), level-0 coordinates, validity-masked.
    """
    alloc = _level_allocation(n_features, n_levels, scale)
    levels = [img.astype(jnp.float32)]
    for l in range(1, n_levels):
        H, W = levels[0].shape
        h = int(round(H / scale**l))
        w = int(round(W / scale**l))
        levels.append(jax.image.resize(levels[0], (h, w), method="bilinear"))

    outs = []
    for l, (im, n_l) in enumerate(zip(levels, alloc)):
        if min(im.shape) < PATCH + 8 or n_l <= 0:
            continue
        smap = fast.nms3(fast.fast_score_map(im, threshold))
        # keep the descriptor patch inside the image: zero a 17px border
        H, W = im.shape
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        b = HALF_PATCH + 2
        inb = (ys >= b) & (ys < H - b) & (xs >= b) & (xs < W - b)
        smap = jnp.where(inb, smap, 0.0)
        uv_l, sc, val = select_keypoints(smap, n_l, cell=cell)
        ang = ic_angle(im, uv_l)
        blurred = gauss_blur7(im)
        desc = brief_descriptors(blurred, uv_l, ang)
        uv0 = uv_l * (scale**l)
        outs.append(
            (
                uv0,
                uv_l,
                jnp.full((n_l,), l, dtype=jnp.int32),
                ang,
                sc,
                desc,
                val,
            )
        )
    return Keypoints(
        uv=jnp.concatenate([o[0] for o in outs]),
        uv_level=jnp.concatenate([o[1] for o in outs]),
        level=jnp.concatenate([o[2] for o in outs]),
        angle=jnp.concatenate([o[3] for o in outs]),
        score=jnp.concatenate([o[4] for o in outs]),
        desc=jnp.concatenate([o[5] for o in outs]),
        valid=jnp.concatenate([o[6] for o in outs]),
    )


@functools.partial(jax.jit, static_argnames=("n_keep", "cell"))
def extract_box_orb(
    img: jnp.ndarray,
    quads: jnp.ndarray,
    quads_valid: jnp.ndarray,
    n_keep: int = 256,
    cell: int = 8,
    threshold: float = 7.0,
    shrink: float = 3.0,
) -> Keypoints:
    """Text-box feature densification + boundary pruning in one pass.

    The reference runs a second full ORB per text box on the box-masked image
    (FeatExtracText, src/frame.cc:232,334-356) and then deletes features
    within 3 px of the box boundary (BoundFeatDele_T with WinText = -3,
    src/frame.cc:239-244, src/tool.cc:456-509) — these keypoints feed the
    loop-closure Sim3 text matching (SearchMatch_Text,
    src/loopClosing.cc:738-821). Here both steps fuse into one masked
    selection: the level-0 FAST score map is zeroed outside the union of the
    SHRUNK detection quads (corners pulled `shrink` px toward the centroid —
    the boundary prune), then a per-cell-boosted top-k picks up to n_keep
    in-box corners, with IC-angle + rBRIEF like the main pass.

    quads [D, 4, 2] level-0 px with validity [D]; returns a Keypoints pool of
    size n_keep (level 0 only — boxes are small; the reference's per-box
    pyramid keypoints above level 0 are rare and only ever used at level 0
    by the Sim3 matcher).
    """
    from . import rasterize

    H, W = img.shape
    smap = fast.nms3(fast.fast_score_map(img, threshold))
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    b = HALF_PATCH + 2
    inb = (ys >= b) & (ys < H - b) & (xs >= b) & (xs < W - b)

    c = quads.mean(axis=1, keepdims=True)  # [D, 1, 2]
    d = c - quads
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-6)
    qs = quads + shrink * dn  # corners pulled toward the centroid
    masks = jax.vmap(lambda q: rasterize.quad_mask(q, H, W))(qs)  # [D, H, W]
    inbox = (masks & quads_valid[:, None, None]).any(axis=0)
    smap = jnp.where(inbox & inb, smap, 0.0)

    uv, sc, val = select_keypoints(smap, n_keep, cell=cell)
    ang = ic_angle(img, uv)
    desc = brief_descriptors(gauss_blur7(img), uv, ang)
    return Keypoints(
        uv=uv, uv_level=uv,
        level=jnp.zeros((n_keep,), dtype=jnp.int32),
        angle=ang, score=sc, desc=desc, valid=val,
    )


@jax.jit
def pack_keypoints(*kps: Keypoints) -> jnp.ndarray:
    """Pack one or more Keypoints pools into a single [N, 14] f32 array for
    ONE device->host transfer (cols: uv 2, level 1, angle 1, score 1,
    valid 1, desc-bits 8). Each readback is a full tunnel round-trip
    (~25-100 ms measured round 4); the un-packed Frame constructor paid 10
    of them per frame. Decode with unpack_keypoints_np."""
    rows = []
    for kp in kps:
        desc_f = jax.lax.bitcast_convert_type(kp.desc, jnp.float32)
        rows.append(jnp.concatenate([
            kp.uv,
            kp.level.astype(jnp.float32)[:, None],
            kp.angle[:, None],
            kp.score[:, None],
            kp.valid.astype(jnp.float32)[:, None],
            desc_f,
        ], axis=1))
    return jnp.concatenate(rows, axis=0)


def unpack_keypoints_np(packed: np.ndarray):
    """Host-side decode of pack_keypoints output.

    Returns (uv [N,2] f32, level [N] i32, angle [N] f32, score [N] f32,
    valid [N] bool, desc [N,8] u32)."""
    uv = packed[:, 0:2].astype(np.float32)
    level = packed[:, 2].astype(np.int32)
    angle = packed[:, 3].astype(np.float32)
    score = packed[:, 4].astype(np.float32)
    valid = packed[:, 5] > 0.5
    desc = np.ascontiguousarray(packed[:, 6:14], dtype=np.float32).view(np.uint32)
    return uv, level, angle, score, valid, desc


def pad_keypoints(kp: Keypoints, capacity: int) -> Keypoints:
    """Pad/truncate a Keypoints pool to a fixed capacity."""
    n = kp.uv.shape[0]
    if n == capacity:
        return kp

    def fix(x, fill=0):
        if x.shape[0] >= capacity:
            return x[:capacity]
        pad_width = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    return Keypoints(
        uv=fix(kp.uv),
        uv_level=fix(kp.uv_level),
        level=fix(kp.level),
        angle=fix(kp.angle),
        score=fix(kp.score),
        desc=fix(kp.desc),
        valid=fix(kp.valid, fill=False),
    )
