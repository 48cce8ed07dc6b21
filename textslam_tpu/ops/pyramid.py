"""Image pyramid + gradient kernels.

The reference builds, per frame, an 8-level ×2 pyramid with cv::pyrDown
(5x5 Gaussian then 2x decimation) and Sobel x/y gradients per level
(src/frame.cc:178-204). Here the pyramid is one fused jitted function:
separable 5-tap Gaussian convolutions expressed as grouped convs so XLA maps
them onto the MXU/VPU, plus 3x3 Scharr-free Sobel gradients.

Layout: images are [H, W] float32 in [0, 255]. The pyramid is returned as a
list of per-level dicts (static shapes per level — jit specializes once per
image geometry). For solver-resident storage the frontend packs levels into
padded [L, Hmax, Wmax] arrays.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# cv::pyrDown kernel: outer([1,4,6,4,1]/16)
_GAUSS5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def _sep_conv2d_same(img: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Separable symmetric filter with REFLECT_101 border (OpenCV default)."""
    r = len(k) // 2
    pad = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    kj = jnp.asarray(k)
    # rows
    x = sum(kj[i] * pad[:, i : i + img.shape[1]] for i in range(len(k)))
    x = sum(kj[i] * x[i : i + img.shape[0], :] for i in range(len(k)))
    return x


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown equivalent: Gaussian blur then take even rows/cols."""
    blurred = _sep_conv2d_same(img, _GAUSS5)
    return blurred[::2, ::2]


def sobel(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gradients, REFLECT_101 borders, scale matching cv::Sobel
    (reference applies a 1/8 factor when building pyramid gradients via
    cv::Sobel(...,scale) in src/frame.cc:178-204 — we return raw Sobel and let
    the photometric Jacobian own its scaling)."""
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="reflect")
    # smooth [1,2,1] cross derivative [-1,0,1]
    H, W = img.shape
    # gx: derivative along x (columns), smoothing along y
    dx = p[:, 2 : W + 2] - p[:, 0:W]  # [H+2, W]
    gx = dx[0:H, :] + 2.0 * dx[1 : H + 1, :] + dx[2 : H + 2, :]
    dy = p[2 : H + 2, :] - p[0:H, :]  # [H, W+2]
    gy = dy[:, 0:W] + 2.0 * dy[:, 1 : W + 1] + dy[:, 2 : W + 2]
    return gx, gy


@functools.partial(jax.jit, static_argnames=("levels",))
def build_pyramid(img: jnp.ndarray, levels: int = 8):
    """Build the ×2 intensity pyramid + per-level Sobel gradients.

    Returns (images, grads): tuples of per-level [H_l, W_l] arrays and
    [H_l, W_l, 2] gradient stacks. All shapes static per level.
    """
    imgs: List[jnp.ndarray] = [img.astype(jnp.float32)]
    for _ in range(1, levels):
        imgs.append(pyr_down(imgs[-1]))
    grads = []
    for im in imgs:
        gx, gy = sobel(im)
        grads.append(jnp.stack([gx, gy], axis=-1))
    return tuple(imgs), tuple(grads)


def pack_pyramid(imgs, grads, pad_to=None):
    """Pack per-level arrays into flat padded buffers for solver residency.

    Returns dict with:
      data:   [L, Hmax, Wmax, 3]  (intensity, gx, gy)
      shapes: [L, 2] int32 actual (H, W) per level
    Levels beyond their true extent are zero — samplers gate by `shapes`.
    """
    L = len(imgs)
    Hmax, Wmax = imgs[0].shape if pad_to is None else pad_to
    data = jnp.zeros((L, Hmax, Wmax, 3), dtype=jnp.float32)
    shapes = np.zeros((L, 2), dtype=np.int32)
    for l, (im, g) in enumerate(zip(imgs, grads)):
        h, w = im.shape
        shapes[l] = (h, w)
        lvl = jnp.concatenate([im[..., None], g], axis=-1)
        data = data.at[l, :h, :w, :].set(lvl)
    # shapes stay HOST numpy: they are static per-camera metadata consumed
    # by host code every frame (np.asarray on a device copy would cost a
    # tunnel round-trip per frame); device consumers upload the 8x2 ints
    return {"data": data, "shapes": shapes}
