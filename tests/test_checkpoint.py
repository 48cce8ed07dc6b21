"""Checkpoint/resume: a SLAM run saved mid-sequence and resumed must keep
tracking and end with a consistent map."""

import numpy as np
import pytest

from textslam_tpu.config import TextSLAMConfig, CameraConfig
from textslam_tpu.mapper import checkpoint
import synth


def make_cfg():
    return TextSLAMConfig(
        no_text=True,
        camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX, cy=synth.CY,
                            width=synth.W, height=synth.H, fps=10.0),
    )


class TestCheckpoint:
    def test_save_load_resume(self, tmp_path):
        from textslam_tpu.system import TextSLAM

        frames, gt = synth.render_sequence(n_frames=16, seed=0)
        cfg = make_cfg()
        slam = TextSLAM(cfg)
        half = 10
        for i in range(half):
            slam.track_monocular(frames[i], float(i))
        assert slam.tracker.state == 1

        ckpt = str(tmp_path / "map.npz")
        checkpoint.save(ckpt, slam.map, tracker=slam.tracker)

        # fresh system, resume
        slam2 = TextSLAM(cfg)
        slam2.map = checkpoint.load(ckpt, cfg, tracker=slam2.tracker)
        slam2.tracker.map = slam2.map
        slam2.frame_count = half
        assert slam2.map.n_points == slam.map.n_points
        assert len(slam2.map.keyframes) == len(slam.map.keyframes)
        np.testing.assert_array_equal(slam2.map.kf_pose, slam.map.kf_pose)
        # pt_n_obs must survive the round trip: a zeroed count would disable
        # the KF-policy c2 condition after resume (ADVICE r1, medium)
        n = slam.map.n_points
        np.testing.assert_array_equal(slam2.map.pt_n_obs[:n], slam.map.pt_n_obs[:n])
        assert slam2.map.pt_n_obs[:n].max() >= 2
        np.testing.assert_array_equal(
            slam2.map.pt_desc_latest[:n], slam.map.pt_desc_latest[:n])

        for i in range(half, len(frames)):
            slam2.track_monocular(frames[i], float(i))
        assert slam2.tracker.state == 1
        # resumed run stays accurate
        kts = np.array([kf.timestamp for kf in slam2.map.keyframes])
        kposes = np.stack([slam2.map.kf_pose[kf.kid] for kf in slam2.map.keyframes])
        ate = synth.ate_rmse(kts, kposes, gt)
        assert ate < 0.015, f"resumed ATE {ate}"

    def test_legacy_checkpoint_missing_fields(self, tmp_path):
        """Checkpoints written before new fields existed must still load,
        recomputing pt_n_obs from the observation registries."""
        from textslam_tpu.system import TextSLAM

        frames, _ = synth.render_sequence(n_frames=10, seed=0)
        cfg = make_cfg()
        slam = TextSLAM(cfg)
        for i in range(len(frames)):
            slam.track_monocular(frames[i], float(i))
        ckpt = str(tmp_path / "map.npz")
        checkpoint.save(ckpt, slam.map, tracker=slam.tracker)
        # strip the new fields to simulate an old checkpoint
        z = dict(np.load(ckpt, allow_pickle=False))
        for k in ("pt_n_obs", "pt_desc_latest", "pt_desc_second", "tx_sem_score"):
            z.pop(k, None)
        np.savez_compressed(ckpt, **z)

        m2 = checkpoint.load(ckpt, cfg)
        n = slam.map.n_points
        np.testing.assert_array_equal(m2.pt_n_obs[:n], slam.map.pt_n_obs[:n])
        np.testing.assert_array_equal(m2.pt_desc_latest[:n], m2.pt_desc[:n])
        assert np.isinf(m2.tx_sem_score).all()
