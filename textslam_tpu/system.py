"""System façade: the `TextSLAM` object a user drives frame by frame.

Mirrors system::system / TrackMonocular / RecordKeyFrame
(src/system.h:28-30, src/system.cc) — construct map + tracker (+ text
frontend + loop closer unless disabled), feed frames, write TUM output.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .config import TextSLAMConfig
from .mapper.state import SlamMap
from .frontend.frame import TextDetection, build_frame
from .frontend.tracking import Tracker, OK
from .io import trajectory


class TextSLAM:
    def __init__(self, cfg: TextSLAMConfig, output_dir: Optional[str] = None):
        self.cfg = cfg
        self.map = SlamMap(cfg)
        self.tracker = Tracker(cfg, self.map)
        self.output_dir = output_dir
        self.frame_count = 0
        if not cfg.no_text:
            from .frontend.text import TextFrontend

            self.tracker.text_frontend = TextFrontend(cfg, self.map, self.tracker)
        from .loop.closing import LoopCloser

        self.loop_closer = LoopCloser(cfg, self.map)
        self.loop_closer.tracker = self.tracker
        self.tracker.loop_hook = self._on_keyframe

    def _on_keyframe(self, kid: int):
        if self.loop_closer is not None and not self.cfg.no_text:
            self.loop_closer.run(kid)
        if self.output_dir:
            self.record_keyframes(os.path.join(self.output_dir, "keyframe_latest.txt"))

    def track_monocular(
        self,
        image: np.ndarray,
        timestamp: float,
        detections: Optional[List[TextDetection]] = None,
    ) -> Optional[np.ndarray]:
        """Track one undistorted grayscale frame; returns Tcw [7] or None."""
        from .utils.profiling import phase as _phase

        with _phase("frame.build"):
            frame = build_frame(
                self.cfg,
                image,
                frame_id=self.frame_count,
                timestamp=timestamp,
                detections=detections,
                n_features=(
                    self.cfg.orb.n_features_init
                    if self.tracker.state != OK
                    else self.cfg.orb.n_features
                ),
                with_pyramid=not self.cfg.no_text,
            )
        self.frame_count += 1
        ok = self.tracker.process(frame)
        return frame.pose if ok else None

    def save_checkpoint(self, path: str, extra: Optional[dict] = None):
        """Serialize the full resumable state (map, tracker motion state,
        text-frontend reference buffers, loop bookkeeping). The reference has
        no analog (its only durable artifact is the rewritten trajectory,
        src/tracking.cc:2564-2586); SURVEY §5 names real checkpoint/resume a
        required subsystem of this framework."""
        from .mapper import checkpoint

        ex = {"frame_count": int(self.frame_count),
              "last_loop_kid": int(self.loop_closer.last_loop_kid),
              "closed_loops": [list(p) for p in self.loop_closer.closed_loops],
              "loop_key": np.asarray(self.loop_closer._key).tolist()}
        ex.update(extra or {})
        checkpoint.save(path, self.map, tracker=self.tracker,
                        text_frontend=self.tracker.text_frontend, extra=ex)

    def load_checkpoint(self, path: str) -> dict:
        """Restore from save_checkpoint; returns the stored extra dict.
        KLT new-text tracks restart at the next keyframe (the accumulator
        holds device pyramids and is deliberately not serialized)."""
        from .mapper import checkpoint

        self.map = checkpoint.load(path, self.cfg, tracker=self.tracker,
                                   text_frontend=self.tracker.text_frontend)
        self.tracker.map = self.map
        self.loop_closer.map = self.map
        ex = checkpoint.read_extra(path)
        self.frame_count = int(ex.get("frame_count", 0))
        self.loop_closer.last_loop_kid = int(
            ex.get("last_loop_kid", self.loop_closer.last_loop_kid))
        self.loop_closer.closed_loops = [
            tuple(p) for p in ex.get("closed_loops", [])]
        if "loop_key" in ex:
            import jax.numpy as jnp

            self.loop_closer._key = jnp.asarray(ex["loop_key"],
                                                dtype=jnp.uint32)
        return ex

    def record_keyframes(self, path: str):
        """Write the keyframe trajectory in TUM format."""
        kfs = self.map.keyframes
        ts = [kf.timestamp for kf in kfs]
        poses = np.stack([self.map.kf_pose[kf.kid] for kf in kfs]) if kfs else np.zeros((0, 7))
        trajectory.write_tum(path, ts, poses)

    def record_frames(self, path: str):
        """Write the full per-frame trajectory (pose_F analog)."""
        traj = self.tracker.trajectory
        ts = [t for t, _ in traj]
        poses = np.stack([p for _, p in traj]) if traj else np.zeros((0, 7))
        trajectory.write_tum(path, ts, poses)
