"""Mini cap-scale dress rehearsal (VERDICT r4 next #2).

Runs the FULL pipeline end-to-end over a long out-and-back-twice sequence
with pool caps derived from the sequence length (MapConfig.derive — the
reference's param_M rule), with the LARGE-K solver paths forced on
(segment-sum camera assembly + decomposed landmark pass) so the scale
machinery runs in-pipeline, not just in unit tests. Asserts completion,
keyframe growth, loop closure, pool-headroom accounting, bounded host
memory, and ATE.

The full 1,000-frame/200-KF rehearsal runs on the real chip via
`bench_scale.py` (numbers in BASELINE.md); this test keeps the same code
path regression-checked on the CPU mesh at a suite-friendly horizon.
Override with TEXTSLAM_REHEARSAL_FRAMES to run longer.
"""

import dataclasses
import os

import numpy as np
import pytest

import synth
from textslam_tpu.config import CameraConfig, MapConfig, TextSLAMConfig
from textslam_tpu.solver import ba

N_FRAMES = int(os.environ.get("TEXTSLAM_REHEARSAL_FRAMES", "200"))


@pytest.fixture(scope="module")
def rehearsal():
    from textslam_tpu.system import TextSLAM

    world = synth.TextWorld(seed=3, boxes_per_plane=3)
    poses = synth.camera_path(N_FRAMES, "outback2")
    frames = [world.render(p) for p in poses]
    dets = [world.detections(p) for p in poses]

    cfg = TextSLAMConfig(
        no_text=False,
        camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX,
                            cy=synth.CY, width=synth.W, height=synth.H,
                            fps=10.0),
    )
    cfg = dataclasses.replace(
        cfg,
        map=MapConfig.derive(N_FRAMES, cfg.camera.fps, cfg.map),
        solver=dataclasses.replace(cfg.solver, global_decompose_kfs=16),
    )

    # force the large-K camera assembly for EVERY solve (window + global):
    # the suite horizon keeps K below the production switch point, and the
    # scale path must be exercised in-pipeline, not only in unit tests
    old_cap = ba.ONEHOT_MAX_PAIR_BUCKETS
    ba.ONEHOT_MAX_PAIR_BUCKETS = 1
    try:
        slam = TextSLAM(cfg)
        rss = []
        for i in range(N_FRAMES):
            slam.track_monocular(frames[i], float(i), detections=dets[i])
            if (i + 1) % 50 == 0:
                with open("/proc/self/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            rss.append(float(line.split()[1]) / 1024.0)
                            break
    finally:
        ba.ONEHOT_MAX_PAIR_BUCKETS = old_cap
    return slam, poses, cfg, rss


class TestScaleRehearsal:
    def test_completes_with_keyframe_growth(self, rehearsal):
        slam, poses, cfg, rss = rehearsal
        n_kf = len(slam.map.keyframes)
        assert n_kf >= N_FRAMES // 8, f"only {n_kf} KFs over {N_FRAMES} frames"
        # pool headroom accounting: derived caps left real headroom and
        # nothing saturated
        assert n_kf < cfg.map.max_keyframes
        assert slam.map.saturation_drops == {
            "keyframes": 0, "points": 0, "texts": 0}

    def test_loop_closed(self, rehearsal):
        slam, poses, cfg, rss = rehearsal
        assert len(slam.loop_closer.closed_loops) >= 1, (
            "out-and-back-twice sequence closed no loop")

    def test_trajectory_accuracy(self, rehearsal):
        slam, poses, cfg, rss = rehearsal
        traj = slam.tracker.trajectory
        ts = [t for t, _ in traj]
        est = np.stack([p for _, p in traj])
        ate = synth.ate_rmse(ts, est, poses)
        assert ate < 0.06, f"rehearsal ATE {ate}"

    def test_host_memory_bounded(self, rehearsal):
        slam, poses, cfg, rss = rehearsal
        # steady growth, not runaway: the second half of the run adds less
        # than 60% on top of the midpoint RSS (pyramids are the dominant
        # per-KF host cost and are O(1) per keyframe)
        assert len(rss) >= 2
        mid, end = rss[len(rss) // 2 - 1], rss[-1]
        assert end < mid * 1.6 + 500, f"RSS grew {mid} -> {end} MB"
