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

    def test_legacy_checkpoint_backfills_tx_num_obvs(self, tmp_path):
        """Pre-r3 checkpoints lack tx_num_obvs: IMMATURE objects backfill
        their maturation counter from tx_good_obs and GOOD objects get at
        least min_obs_promote, so promotion isn't delayed after resume
        (ADVICE r3 #3)."""
        from textslam_tpu.mapper.state import SlamMap, TEXT_GOOD, TEXT_IMMATURE

        cfg = make_cfg()
        m = SlamMap(cfg)
        t_good = m.add_text(0, np.array([0, 0, -0.5], np.float32),
                            np.zeros((4, 2), np.float32), "EXIT", 0.9, 0,
                            state=TEXT_GOOD)
        t_imm = m.add_text(0, np.array([0, 0, -0.5], np.float32),
                           np.zeros((4, 2), np.float32), "CAFE", 0.9, 0,
                           state=TEXT_IMMATURE)
        m.tx_good_obs[t_good] = 1
        m.tx_good_obs[t_imm] = 3
        m.tx_num_obvs[t_good] = 9
        m.tx_num_obvs[t_imm] = 3
        ckpt = str(tmp_path / "map.npz")
        checkpoint.save(ckpt, m)
        z = dict(np.load(ckpt, allow_pickle=False))
        z.pop("tx_num_obvs")
        np.savez_compressed(ckpt, **z)

        m2 = checkpoint.load(ckpt, cfg)
        assert m2.tx_num_obvs[t_imm] == 3  # from tx_good_obs
        assert m2.tx_num_obvs[t_good] >= cfg.text.min_obs_promote

    def test_resume_restores_window_pyr_dev(self, tmp_path):
        """Window KFs re-enter device residency on load (ADVICE r3 #1)."""
        from textslam_tpu.mapper.state import SlamMap, Keyframe

        cfg = make_cfg()
        m = SlamMap(cfg)
        T0 = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        for k in range(3):
            kf = Keyframe(
                kid=k, frame_id=k, timestamp=float(k),
                kp_uv=np.zeros((4, 2), np.float32),
                kp_level=np.zeros(4, np.int32),
                kp_angle=np.zeros(4, np.float32),
                kp_desc=np.zeros((4, 8), np.uint32),
                kp_valid=np.ones(4, bool),
                kp_point=np.full(4, -1, np.int32),
                obs_good=np.zeros(4, bool),
                pyr_data=np.ones((4, 16, 16, 3), np.float32),
                pyr_shapes=np.array([[16, 16]] * 4, np.int32),
            )
            m.add_keyframe(kf, T0)
        ckpt = str(tmp_path / "map.npz")
        checkpoint.save(ckpt, m)
        m2 = checkpoint.load(ckpt, cfg)
        assert all(kf.pyr_data is not None for kf in m2.keyframes)
        assert all(kf.pyr_dev is not None for kf in m2.keyframes)
