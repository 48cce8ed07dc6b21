"""Long-sequence regime: the local-map-cap narrowing path must actually
execute and keep tracking healthy (VERDICT r2 weak #7 / next #6).

The narrowing engages when n_points > MapConfig.max_points // 2
(frontend/tracking.py Tracker._narrow_to_local_map). Reaching the default
16384-point threshold needs hundreds of keyframes; here the POOL is sized
down so a rendered sequence crosses the same code path — the branch logic
is identical at any cap. The full-scale per-frame cost at the default caps
is measured on hardware by bench_e2e.py (BASELINE.md long-run note).
"""

import numpy as np
import pytest

from textslam_tpu.config import TextSLAMConfig, CameraConfig, MapConfig
import synth


class TestLocalMapNarrowing:
    def test_narrowing_engages_and_tracking_survives(self):
        from textslam_tpu.system import TextSLAM

        cfg = TextSLAMConfig(
            no_text=True,
            camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX,
                                cy=synth.CY, width=synth.W, height=synth.H,
                                fps=10.0),
            # small pool: the run crosses max_points//2 after a few KFs
            map=MapConfig(max_points=2048),
        )
        frames, gt = synth.render_sequence(n_frames=30, seed=4, kind="lateral")
        slam = TextSLAM(cfg)
        tr = slam.tracker
        calls = {"n": 0}
        orig = tr._narrow_to_local_map

        def spy(frame, pt_valid):
            calls["n"] += 1
            out = orig(frame, pt_valid)
            # the narrowed mask must still leave candidates to match
            assert out[: slam.map.n_points].sum() > 50
            return out

        tr._narrow_to_local_map = spy
        for i, img in enumerate(frames):
            slam.track_monocular(img, float(i))
        m = slam.map
        assert m.n_points > cfg.map.max_points // 2, (
            f"fixture never crossed the cap: {m.n_points} points")
        assert calls["n"] > 0, "narrowing branch never executed"
        assert slam.tracker.state == 1, "tracking lost under narrowing"
        kts = np.array([kf.timestamp for kf in m.keyframes])
        kposes = np.stack([m.kf_pose[kf.kid] for kf in m.keyframes])
        ate = synth.ate_rmse(kts, kposes, gt)
        assert ate < 0.02, f"narrowed-map KF ATE {ate}"

    def test_point_pool_cap_respected(self):
        """Triangulation stops creating points at the pool cap instead of
        raising (frontend/tracking.py _triangulate_new guard)."""
        from textslam_tpu.system import TextSLAM

        cfg = TextSLAMConfig(
            no_text=True,
            camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX,
                                cy=synth.CY, width=synth.W, height=synth.H,
                                fps=10.0),
            map=MapConfig(max_points=1024),
        )
        frames, gt = synth.render_sequence(n_frames=20, seed=5, kind="lateral")
        slam = TextSLAM(cfg)
        for i, img in enumerate(frames):
            slam.track_monocular(img, float(i))
        assert slam.map.n_points <= 1024
        assert slam.tracker.state == 1
