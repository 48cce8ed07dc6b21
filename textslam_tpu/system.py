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
