"""Per-frame construction: ORB keypoints + direct-alignment pyramid.

Reference frame ctor (src/frame.cc:38-64) builds: 8-level x2 pyramid + Sobel,
scene ORB + per-text-box ORB, per-text TextFeature pyramids, and a 64x48
feature grid. Here the pyramid and ORB extraction are jitted device kernels;
the "grid" never materializes — windowed matching is a dense mask
(ops.matching.window_mask).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..config import TextSLAMConfig
from ..ops import orb, pyramid


@dataclasses.dataclass
class TextDetection:
    """One precomputed OCR detection (quad + recognized string).

    Mirrors TextInfo (src/setting.h:98-104): mean string, score, language
    (classified from UTF-8 byte lengths, src/tool.cc:163-215)."""

    quad: np.ndarray  # [4, 2] float32 pixel corners
    text: str
    score: float
    lang: int = 0  # 0 latin-ish, 1 CJK-ish


@dataclasses.dataclass
class Frame:
    frame_id: int
    timestamp: float
    shape: tuple  # (H, W)
    # padded keypoint SoA (numpy mirrors — LAZY when kp_packed_dev is set:
    # the packed device pool is the primary copy and the host mirror
    # materializes on first access via ensure_host_kp, so non-keyframe
    # frames never pay the readback round-trip)
    kp_uv: Optional[np.ndarray] = None
    kp_level: Optional[np.ndarray] = None
    kp_angle: Optional[np.ndarray] = None
    kp_desc: Optional[np.ndarray] = None
    kp_valid: Optional[np.ndarray] = None
    # packed [N, 14] device keypoint pool (ops.orb.pack_keypoints layout)
    kp_packed_dev: Optional[object] = None
    # direct pyramid (packed) for photometric text alignment
    pyr_data: Optional[np.ndarray] = None  # [L, H, W, 3]
    pyr_shapes: Optional[np.ndarray] = None  # [L, 2]
    # device-resident copy of pyr_data (jnp array) — avoids re-uploading
    # the packed pyramid for every photometric solve
    pyr_dev: Optional[object] = None
    detections: List[TextDetection] = dataclasses.field(default_factory=list)
    pose: Optional[np.ndarray] = None  # [7] Tcw once tracked

    @property
    def n_valid(self) -> int:
        ensure_host_kp(self)
        return int(self.kp_valid.sum())


def ensure_host_kp(frame) -> None:
    """Materialize (once) the host keypoint mirror from the packed device
    pool. One packed readback; no-op when the mirror already exists."""
    if frame.kp_uv is not None or getattr(frame, "kp_packed_dev", None) is None:
        return
    from ..ops import orb
    from ..utils.profiling import phase

    with phase("frame.kp_pull"):
        packed = np.asarray(frame.kp_packed_dev)
    uv, level, angle, _, valid, desc = orb.unpack_keypoints_np(packed)
    frame.kp_uv = uv
    frame.kp_level = level
    frame.kp_angle = angle
    frame.kp_desc = desc
    frame.kp_valid = valid


def packed_kp_dev(frame):
    """The packed [N, 14] device keypoint pool of a Frame, building it from
    the host mirror when the frame wasn't device-built (tests, replays)."""
    if getattr(frame, "kp_packed_dev", None) is not None:
        return frame.kp_packed_dev
    import jax
    import jax.numpy as jnp

    desc_f = jax.lax.bitcast_convert_type(
        jnp.asarray(frame.kp_desc, dtype=jnp.uint32), jnp.float32)
    packed = jnp.concatenate([
        jnp.asarray(frame.kp_uv, dtype=jnp.float32),
        jnp.asarray(frame.kp_level, dtype=jnp.float32)[:, None],
        jnp.asarray(frame.kp_angle, dtype=jnp.float32)[:, None],
        jnp.zeros((frame.kp_uv.shape[0], 1), jnp.float32),
        jnp.asarray(frame.kp_valid, dtype=jnp.float32)[:, None],
        desc_f,
    ], axis=1)
    try:
        frame.kp_packed_dev = packed
    except Exception:
        pass
    return packed


def host_pyr(obj) -> Optional[np.ndarray]:
    """Materialize (once) and return the host mirror of a Frame/Keyframe
    packed pyramid. Returns None when the object carries no pyramid."""
    if obj.pyr_data is None and obj.pyr_dev is not None:
        obj.pyr_data = np.asarray(obj.pyr_dev)
    return obj.pyr_data


def has_pyr(obj) -> bool:
    """Pyramid-existence check that does not force the host mirror."""
    return obj.pyr_shapes is not None


def build_frame(
    cfg: TextSLAMConfig,
    img: np.ndarray,
    frame_id: int,
    timestamp: float,
    detections: Optional[List[TextDetection]] = None,
    n_features: Optional[int] = None,
    with_pyramid: bool = True,
) -> Frame:
    """Construct a Frame from an undistorted grayscale image (float32 [H,W])."""
    from ..utils.profiling import phase

    imj = jnp.asarray(img, dtype=jnp.float32)
    # dispatch BOTH extractions before any host pull: the pulls force a
    # device sync, so pulling the scene keypoints between the two kernels
    # serialized them on the tunneled TPU
    with phase("frame.orb"):
        kp = orb.extract_orb(
            imj,
            n_features=n_features or cfg.orb.n_features,
            n_levels=cfg.orb.n_levels,
            scale=cfg.orb.scale_factor,
            threshold=float(cfg.orb.fast_threshold_min),
        )
    bkp = None
    # in-box densification + boundary pruning (FeatExtracText +
    # BoundFeatDele_T; these corners feed loop Sim3 text matching)
    if detections and not cfg.no_text and cfg.orb.n_box_features > 0:
        with phase("frame.box_orb"):
            D = cfg.text.max_detections_per_frame
            quads = np.zeros((D, 4, 2), np.float32)
            qvalid = np.zeros(D, bool)
            for i, det in enumerate(detections[:D]):
                quads[i] = det.quad
                qvalid[i] = True
            bkp = orb.extract_box_orb(
                imj, jnp.asarray(quads), jnp.asarray(qvalid),
                n_keep=cfg.orb.n_box_features,
                threshold=float(cfg.orb.fast_threshold_min),
                shrink=cfg.orb.box_boundary_margin,
            )
    pyr_data = pyr_shapes = pyr_dev = None
    packed = None
    if with_pyramid and not cfg.no_text:
        with phase("frame.pyramid"):
            n_lv = max(cfg.pyramid.init_ba_levels) + 1
            imgs, grads = pyramid.build_pyramid(imj, levels=n_lv)
            packed = pyramid.pack_pyramid(imgs, grads)
            # keep the DEVICE array: the photometric solvers consume level
            # slices of it every frame / every BA build. The host mirror
            # stays LAZY (host_pyr): the eager device->host pull of the
            # ~15 MB packed pyramid measured 1.04 s/frame on the tunneled
            # TPU — the single largest per-frame cost (bench_e2e phase
            # table). It materializes only at keyframe eviction /
            # checkpoint time.
            pyr_dev = packed["data"]
    # keypoints stay DEVICE-RESIDENT as one packed pool; the host mirror
    # materializes lazily (ensure_host_kp) — only keyframes and the init
    # path ever need it, so steady non-KF frames skip the readback entirely
    pools = (kp,) if bkp is None else (kp, bkp)
    kpk_dev = orb.pack_keypoints(*pools)
    if packed is not None:
        pyr_shapes = np.asarray(packed["shapes"])
    return Frame(
        frame_id=frame_id,
        timestamp=timestamp,
        shape=img.shape,
        kp_packed_dev=kpk_dev,
        pyr_data=pyr_data,
        pyr_shapes=pyr_shapes,
        pyr_dev=pyr_dev,
        detections=list(detections or []),
    )
