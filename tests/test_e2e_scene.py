"""End-to-end scene-only SLAM on a rendered synthetic sequence.

This is the SURVEY.md §7.2 M3 checkpoint: ORB tracking + PoseOptim + windowed
point BA with text disabled (`Exp noText` ablation), ATE-checked against
exact ground truth.
"""

import numpy as np
import dataclasses
import pytest

from textslam_tpu.config import TextSLAMConfig, CameraConfig
import synth


@pytest.fixture(scope="module")
def sequence():
    return synth.render_sequence(n_frames=22, seed=0, kind="lateral")


def make_cfg():
    return TextSLAMConfig(
        no_text=True,
        camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX, cy=synth.CY,
                            width=synth.W, height=synth.H, fps=10.0),
    )


class TestSceneSLAM:
    def test_tracks_sequence(self, sequence, tmp_path):
        from textslam_tpu.system import TextSLAM

        frames, gt = sequence
        slam = TextSLAM(make_cfg())
        n_ok = 0
        for i, img in enumerate(frames):
            pose = slam.track_monocular(img, float(i))
            if pose is not None:
                n_ok += 1
        assert slam.tracker.state == 1, "tracker lost"
        assert n_ok >= len(frames) - 5
        assert len(slam.map.keyframes) >= 3
        assert slam.map.n_points > 100

        # ATE on keyframes (the reference's evaluated output — BA-refined)
        kts = np.array([kf.timestamp for kf in slam.map.keyframes])
        kposes = np.stack([slam.map.kf_pose[kf.kid] for kf in slam.map.keyframes])
        kf_ate = synth.ate_rmse(kts, kposes, gt)
        assert kf_ate < 0.012, f"KF ATE {kf_ate}"

        # ATE on the full online frame trajectory (never retro-refined)
        traj = slam.tracker.trajectory
        ts = np.array([t for t, _ in traj])
        poses = np.stack([p for _, p in traj])
        ate = synth.ate_rmse(ts, poses, gt)
        # ~1.2m of travel; online per-frame poses within 2.5cm
        assert ate < 0.025, f"frame ATE {ate}"

        # trajectory output round-trips
        out = tmp_path / "keyframe.txt"
        slam.record_keyframes(str(out))
        from textslam_tpu.io.trajectory import read_tum

        ts2, poses2 = read_tum(str(out))
        assert len(ts2) == len(slam.map.keyframes)


class TestDeterminism:
    def test_identical_runs(self, sequence):
        """Reference parity: fully seeded determinism (srand(0) analog)."""
        from textslam_tpu.system import TextSLAM

        frames, gt = sequence
        results = []
        for _ in range(2):
            slam = TextSLAM(make_cfg())
            for i in range(8):
                slam.track_monocular(frames[i], float(i))
            results.append((
                np.stack([slam.map.kf_pose[kf.kid] for kf in slam.map.keyframes]),
                slam.map.n_points,
            ))
        assert results[0][1] == results[1][1]
        np.testing.assert_array_equal(results[0][0], results[1][0])
