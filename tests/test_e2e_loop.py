"""End-to-end loop closing on an out-and-back sequence.

Deterministic duplicated-map scenario: on the return leg the tracker is
blinded to landmarks hosted in early keyframes ("amnesia"), so it rebuilds a
duplicate map of the same scene. The semantic loop closer must then detect
the revisit from text strings (Levenshtein voting with covisibility
exclusion), estimate the Sim3 (≈ identity here — the non-trivial Sim3 path is
covered by test_sim3_opt), fuse duplicate landmarks and run the pose graph +
global refinement without degrading the trajectory.
"""

import dataclasses
import numpy as np
import pytest

from textslam_tpu.config import (TextSLAMConfig, CameraConfig, LoopConfig,
                                 SolverConfig)
import synth


def make_cfg():
    return TextSLAMConfig(
        no_text=False,
        camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX, cy=synth.CY,
                            width=synth.W, height=synth.H, fps=6.0),
        # short synthetic sequence: relax the scale-dependent gates
        # (the reference defaults assume hundreds of KFs — GetThreshWordsNum
        # refuses to attempt a loop with <= 10 covisible KFs)
        loop=LoopConfig(min_kfs_before_loop=6, min_kfs_between_loops=5,
                        num_covis_for_thresh=3),
        # CI affordability on the 2-CPU box: the faithful landmarker
        # schedule (its=50 x levels 3..0) is unit-tested in
        # test_config_consumers; this synthetic loop converges in far fewer
        solver=SolverConfig(iters_landmark=10),
    )


@pytest.fixture(scope="module")
def result():
    from textslam_tpu.system import TextSLAM

    frames, dets, gt, world = synth.render_text_sequence(n_frames=32, seed=0, kind="outback")
    slam = TextSLAM(make_cfg())
    tr = slam.tracker

    amnesia = {"cutoff": None}

    # candidate-mask hook (the supported injection point since the track
    # chain fused into one program): forget points hosted before the cutoff
    def amnesia_hook(pt_valid):
        cut = amnesia["cutoff"]
        if cut is not None:
            m = slam.map
            n = min(m.n_points, len(pt_valid))
            pt_valid[:n] &= ~(m.pt_host[:n] < cut)
        return pt_valid

    tr.pt_candidate_hook = amnesia_hook

    tf = tr.text_frontend

    def text_amnesia_mask(n_texts):
        cut = amnesia["cutoff"]
        mask = np.ones(n_texts, bool)
        if cut is not None:
            m = slam.map
            mask &= ~(m.tx_host[:n_texts] < cut)
        return mask

    tf.pool_mask_hook = text_amnesia_mask

    quarter = len(frames) // 4
    half = len(frames) // 2
    cutoff_at_quarter = None
    for i, img in enumerate(frames):
        if i == quarter:
            cutoff_at_quarter = len(slam.map.keyframes)
        if i == half:
            # forget only the FIRST leg's landmarks: mid-sequence landmarks
            # keep tracking alive, the start region gets duplicated on return
            amnesia["cutoff"] = cutoff_at_quarter
        slam.track_monocular(img, float(i), detections=dets[i])
    # lift amnesia before final asserts so evaluation sees the true state
    amnesia["cutoff"] = None

    # post-loop re-tracking (TrackLocalMap subsumption, PARITY.md): re-feed
    # the final frames with amnesia lifted and record which landmarks the
    # per-frame matcher consumes — loop-side (old leg) points must re-enter
    post_loop_hosts = []
    if slam.loop_closer.closed_loops:
        def record(ok):
            m = slam.map
            sel = np.nonzero(ok)[0]
            sel = sel[sel < m.n_points]
            post_loop_hosts.append(m.pt_host[sel].copy())

        orig_fused = tr._fused_track
        orig_chain = tr._chain_frame

        def fused_recording(frame, guess, radius_scale=1.0):
            pose, kp_idx, ok, inlier, n1 = orig_fused(frame, guess, radius_scale)
            record(ok)
            return pose, kp_idx, ok, inlier, n1

        def chain_recording(frame, guess, radius_scale=1.0):
            track, hook, imm = orig_chain(frame, guess, radius_scale)
            record(track[2])
            return track, hook, imm

        tr._fused_track = fused_recording
        tr._chain_frame = chain_recording
        # original timestamps: any KF inserted here still indexes valid GT
        for i in range(len(frames) - 3, len(frames)):
            slam.track_monocular(frames[i], float(i), detections=dets[i])
        tr._fused_track = orig_fused
        tr._chain_frame = orig_chain
    return slam, gt, world, post_loop_hosts


class TestLoopClosing:
    def test_loop_detected_and_closed(self, result):
        slam, gt, world, post_hosts = result
        assert slam.loop_closer.closed_loops, "no loop closed"
        cur, cand = slam.loop_closer.closed_loops[0]
        assert cand < cur

    def test_landmarks_fused(self, result):
        slam, gt, world, post_hosts = result
        m = slam.map
        # fusion marks replaced points/texts invalid
        assert m.pt_bad[: m.n_points].sum() > 0 or (~m.tx_valid[: m.n_texts]).sum() > 0

    def test_trajectory_still_accurate(self, result):
        slam, gt, world, post_hosts = result
        m = slam.map
        kts = np.array([kf.timestamp for kf in m.keyframes])
        kposes = np.stack([m.kf_pose[kf.kid] for kf in m.keyframes])
        assert np.isfinite(kposes).all()
        ate = synth.ate_rmse(kts, kposes, gt)
        assert ate < 0.03, f"post-loop KF ATE {ate}"

    def test_covisibility_bridged(self, result):
        slam, gt, world, post_hosts = result
        m = slam.map
        cur, cand = slam.loop_closer.closed_loops[0]
        K = len(m.keyframes)
        # after fusion + rebuild, the two legs share landmarks
        bridge = m.M1[:cand + 1, cand + 1:K].sum() + m.M2[:cand + 1, cand + 1:K].sum()
        assert bridge > 0

    def test_post_loop_retracking_consumes_old_landmarks(self, result):
        """TrackLocalMap subsumption (PARITY.md): after the loop closes, the
        per-frame matcher (which projects the WHOLE point pool) must feed
        loop-side landmarks back into tracking — the reference needs a
        dedicated covisibility-limited re-search pass for this
        (src/tracking.cc:546-586); here it falls out of the batched matcher."""
        slam, gt, world, post_hosts = result
        assert post_hosts, "no post-loop frames were tracked"
        cur, cand = slam.loop_closer.closed_loops[0]
        old_side = np.concatenate(post_hosts)
        # the final frames revisit the start region: old-leg-hosted points
        # (host <= loop candidate KF) must appear among the consumed matches
        assert (old_side <= cand).sum() > 0, (
            f"no loop-side landmarks re-entered tracking: hosts {np.unique(old_side)}")
