"""Loop closing at reference strength (VERDICT r2 next #4):

1. A NON-TRIVIAL Sim3 — monocular scale drift is injected as an exact
   similarity transform of the return-leg sub-map (poses t*=s, hosted
   rho/=s, hosted theta/=s), so DetectLoop -> ComputeSim3 must recover
   scale s and the full correct() path (window propagation, fusion,
   SearchAndFuse, Sim3 pose graph with [R, t/s] write-back, rho/theta
   rescale, global + landmark-only BA) must re-unify the two legs.
   Landmark scale is verified against render GT (per-leg theta-magnitude
   ratios must collapse to one constant after correction).
2. An OUTDOOR-config acceptance where the scene-inlier gates decide on the
   REAL ComputeSim3 output (spied, not faked).
3. A multi-loop sequence closing two loops online.

Gate strengths vs reference defaults (src/loopClosing.cc:25-42): the
correctness gates (score thresholds, Sim3 inlier minima/errors, accept
inlier count, per-experiment scene gates, DoubleCheck) run at REFERENCE
values. The scale gates — min_kfs_before_loop/between_loops (20) and
num_covis_for_thresh (10) — count keyframes and are scaled to the synthetic
sequence length with the same ratio (sequence has ~12-16 KFs vs the
dataset's hundreds); they gate WHEN a loop may be attempted, not whether a
candidate is correct.
"""

import dataclasses

import numpy as np
import pytest

from textslam_tpu.config import (TextSLAMConfig, CameraConfig, LoopConfig,
                                 SolverConfig, Experiment)
from textslam_tpu.mapper.state import TEXT_GOOD
import synth


@pytest.fixture(autouse=True, scope="class")
def _clear_between_classes():
    """This module runs three full-pipeline fixtures; XLA:CPU segfaults
    when too many large compiled programs accumulate in one process (see
    conftest's per-module clearing) — drop executables between classes."""
    yield
    import jax

    jax.clear_caches()

SCALE_DRIFT = 1.35


def make_cfg(experiment=Experiment.GENERAL_MOTION, loop_scale_gates=(8, 5, 5),
             double_check=True):
    before, between, covis = loop_scale_gates
    return TextSLAMConfig(
        no_text=False,
        experiment=experiment,
        camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX, cy=synth.CY,
                            width=synth.W, height=synth.H, fps=6.0),
        # double_check=False is ONLY for the outdoor-gate fixtures: the
        # DoubleCheck 2-hop vConnects exclusion is scale-dependent — on this
        # ~14-KF toy map the 2-hop covisible reach spans the ENTIRE map
        # (mid-leg landmarks bridge both legs), so it would exclude every
        # candidate; on real outdoor sequences (hundreds of KFs) the reach
        # is local. The exclusion logic itself is unit-tested in
        # test_loop_logic.py.
        loop=LoopConfig(min_kfs_before_loop=before,
                        min_kfs_between_loops=between,
                        num_covis_for_thresh=covis,
                        double_check_visible_outdoor=double_check),
        solver=SolverConfig(iters_landmark=10),
    )


def run_with_amnesia(cfg, n_frames=32, kind="outback", seed=0,
                     loop_online=True):
    """Out-and-back pipeline run where the tracker is blinded to first-leg
    landmarks on the return leg, forcing a duplicated map (the loop-closure
    fixture of test_e2e_loop, reused)."""
    from textslam_tpu.system import TextSLAM

    frames, dets, gt, world = synth.render_text_sequence(
        n_frames=n_frames, seed=seed, kind=kind)
    slam = TextSLAM(cfg)
    tr = slam.tracker
    if not loop_online:
        slam.loop_closer.last_loop_kid = 10**9  # block online closing

    amnesia = {"cutoff": None}

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

    quarter = n_frames // 4
    half = n_frames // 2
    cutoff_at_quarter = None
    boundary_kid = None
    for i, img in enumerate(frames):
        if i == quarter:
            cutoff_at_quarter = len(slam.map.keyframes)
        if i == half:
            amnesia["cutoff"] = cutoff_at_quarter
            boundary_kid = len(slam.map.keyframes)
        slam.track_monocular(img, float(i), detections=dets[i])
    amnesia["cutoff"] = None
    tr.pt_candidate_hook = None
    tf.pool_mask_hook = None
    return slam, gt, world, boundary_kid


def rescale_subtree(m, J: int, s: float):
    """Exact similarity rescale of the sub-map hosted at KFs >= J: camera
    centers scale by s (t *= s for Tcw), hosted inverse depths by 1/s,
    hosted plane thetas by 1/s — new-leg-internal observations stay exactly
    consistent; the handful of cross-boundary observations become outliers
    for the BA gates, like real drift."""
    K = len(m.keyframes)
    for kid in range(J, K):
        m.kf_pose[kid][4:7] *= s
    for pid in range(m.n_points):
        if m.pt_valid[pid] and m.pt_host[pid] >= J:
            m.pt_rho[pid] /= s
    for tid in range(m.n_texts):
        if m.tx_valid[tid] and int(m.tx_host[tid]) >= J:
            m.tx_theta[tid] /= s


def theta_gt_log_ratios(m, world, gt):
    """(tid, host, log(|theta_est| / |theta_gt|)) per GOOD text object.

    |theta| = 1/plane-distance: in a scale-consistent map all objects share
    ONE ratio (the global monocular scale); a leg-dependent ratio exposes
    un-corrected scale drift. Individual objects carry convergence bias
    (young duplicates can be far off GT), so consumers compare PAIRED
    per-object deltas across snapshots, not raw per-leg medians."""
    out = []
    for tid in range(m.n_texts):
        if not m.tx_valid[tid] or m.tx_state[tid] != TEXT_GOOD:
            continue
        boxes = [b for b in world.boxes if b[2] == m.tx_string[tid]]
        if not boxes:
            continue
        host = int(m.tx_host[tid])
        fid = m.keyframes[host].frame_id
        th_gt = synth.plane_theta_in_cam(world.planes[boxes[0][0]][0], gt[fid])
        r = np.linalg.norm(m.tx_theta[tid]) / np.linalg.norm(th_gt)
        out.append((tid, host, float(np.log(r))))
    return out


@pytest.fixture(scope="module")
def scale_loop():
    """Pipeline map with injected scale drift, then ONE loop closure."""
    cfg = make_cfg()
    slam, gt, world, J = run_with_amnesia(cfg, loop_online=False)
    m = slam.map
    assert J is not None and len(m.keyframes) - J >= 3
    pre_ratios = theta_gt_log_ratios(m, world, gt)
    rescale_subtree(m, J, SCALE_DRIFT)
    drifted_ratios = theta_gt_log_ratios(m, world, gt)

    # spy (not fake): record the REAL compute_sim3 results
    lc = slam.loop_closer
    lc.last_loop_kid = -(10**9)
    recorded = []
    orig_cs = lc.compute_sim3

    def spy(kid, cand):
        res = orig_cs(kid, cand)
        if res is not None:
            recorded.append((kid, cand, np.asarray(res[0]).copy(),
                             res[2], res[3]))
        return res

    lc.compute_sim3 = spy
    closed = lc.run(len(m.keyframes) - 1)
    return (slam, gt, world, J, closed, recorded, pre_ratios, drifted_ratios)


class TestScaleLoop:
    def test_drift_injected(self, scale_loop):
        _, _, _, J, _, _, pre, drifted = scale_loop
        # paired per-object deltas isolate the injected transform from each
        # object's own convergence bias
        pre_by_tid = {t: r for t, h, r in pre}
        deltas_new = [r - pre_by_tid[t] for t, h, r in drifted
                      if h >= J and t in pre_by_tid]
        assert deltas_new, "fixture must carry GOOD texts on the new leg"
        med = np.median(deltas_new)
        assert abs(med + np.log(SCALE_DRIFT)) < 0.02, (
            f"injected rescale not visible: median delta {med:.3f}")

    def test_loop_closed_with_nontrivial_scale(self, scale_loop):
        slam, _, _, _, closed, recorded, _, _ = scale_loop
        assert closed, "loop did not close on the drifted map"
        assert recorded, "compute_sim3 never produced a result"
        # the ACCEPTED Sim3 (best by inliers) must measure the injected scale
        scales = [abs(float(S[7])) for _, _, S, _, _ in recorded]
        best = max(recorded, key=lambda r: r[3])
        s = abs(float(best[2][7]))
        assert (abs(np.log(s) - np.log(SCALE_DRIFT)) < 0.15
                or abs(np.log(s) + np.log(SCALE_DRIFT)) < 0.15), (
            f"recovered scale {s} vs injected {SCALE_DRIFT} (all: {scales})")

    def test_landmark_scale_reunified(self, scale_loop):
        """After correct(): rho/theta rescaled by the host's pose-graph
        scale (src/optimizer.cc:916-955). Verified on PAIRED per-object
        deltas (post − drifted): old-leg landmarks must stay put while
        new-leg landmarks move back toward GT scale by the majority of the
        injected log-drift. (Raw per-leg medians are corrupted by young
        duplicate objects whose absolute theta/GT ratios carry convergence
        bias — the rescale LAW still moves them by exactly the host
        correction, which is what this asserts.)"""
        slam, gt, world, J, closed, _, _, drifted = scale_loop
        assert closed
        post = theta_gt_log_ratios(slam.map, world, gt)
        drift_by_tid = {t: r for t, h, r in drifted}
        d_old = [r - drift_by_tid[t] for t, h, r in post
                 if h < J and t in drift_by_tid]
        d_new = [r - drift_by_tid[t] for t, h, r in post
                 if h >= J and t in drift_by_tid]
        assert d_old
        med_old = float(np.median(d_old))
        # old side: untouched by the correction (refinement noise only)
        assert abs(med_old) < 0.1, f"old-leg landmarks moved: {med_old:.3f}"
        # new-leg duplicates now FUSE into their old-leg counterparts during
        # SearchAndFuse_Text (src/loopClosing.cc:1290-1385, round-4): the
        # paired delta only exists for un-fused survivors. Every drifted
        # new-leg object must either rescale by the host correction or be
        # fused away (observations rewired to the loop-side object).
        fused_new = [t for t, h, _ in drifted
                     if h >= J and not slam.map.tx_valid[t]]
        assert d_new or fused_new, (
            "new-leg duplicates neither rescaled nor fused")
        if d_new:
            med_new = float(np.median(d_new))
            # new side: corrected toward GT scale by most of the injected
            # drift (the pose graph splits the correction between scale and
            # pose blocks; the remainder is absorbed by global/landmark BA)
            recovered = (med_new - med_old) / np.log(SCALE_DRIFT)
            assert recovered > 0.5, (
                f"new-leg landmark scales not re-unified: recovered "
                f"{recovered:.2f} of the injected log-drift "
                f"(deltas old {med_old:.3f} new {med_new:.3f})")
            assert recovered < 1.5, f"over-correction: {recovered:.2f}"
        for t in fused_new:
            # fused duplicates' observations live on in a surviving object
            assert not any(t == t2 for (k2, t2) in slam.map.tx_obs)

    def test_trajectory_reunified(self, scale_loop):
        slam, gt, world, _, closed, _, _, _ = scale_loop
        assert closed
        m = slam.map
        kts = np.array([kf.timestamp for kf in m.keyframes])
        kposes = np.stack([m.kf_pose[kf.kid] for kf in m.keyframes])
        assert np.isfinite(kposes).all()
        ate = synth.ate_rmse(kts, kposes, gt)
        assert ate < 0.06, f"post-correction KF ATE {ate}"


class TestOutdoorGate:
    def test_outdoor_accept_decided_by_scene_inliers(self):
        """OUTDOOR config: Th_MaxInlierNum_S requires >= 10 scene-backed
        inliers at accept (src/loopClosing.cc:29,93-106), evaluated against
        the REAL ComputeSim3 result (DoubleCheck disabled at this map
        scale — see make_cfg)."""
        cfg = make_cfg(experiment=Experiment.OUTDOOR, double_check=False)
        slam, gt, world, J = run_with_amnesia(cfg, loop_online=False)
        m = slam.map
        lc = slam.loop_closer
        lc.last_loop_kid = -(10**9)
        recorded = []
        orig_cs = lc.compute_sim3

        def spy(kid, cand):
            res = orig_cs(kid, cand)
            if res is not None:
                recorded.append(res[3])  # n_scene
            return res

        lc.compute_sim3 = spy
        closed = lc.run(len(m.keyframes) - 1)
        assert recorded, "no Sim3 was computed"
        if closed:
            # acceptance implies the scene gate passed on real counts
            assert max(recorded) >= cfg.loop.min_scene_inliers_outdoor
        else:
            # rejection must be attributable to the outdoor gates, not a
            # missing candidate
            assert max(recorded) < cfg.loop.min_scene_inliers_outdoor or \
                all(r <= cfg.loop.min_inliers for r in recorded)

    def test_outdoor_scene_gate_rejects_textonly_sim3(self):
        """Force the scene-starved case: with map-point 3D suppressed the
        combined matcher yields text-plane-backed pairs only, n_scene ~ 0,
        and the OUTDOOR accept gate must refuse the loop that the indoor
        config would take."""
        cfg = make_cfg(experiment=Experiment.OUTDOOR, double_check=False)
        slam, gt, world, J = run_with_amnesia(cfg, loop_online=False)
        lc = slam.loop_closer
        lc.last_loop_kid = -(10**9)
        orig_cs = lc.compute_sim3

        def scene_starved(kid, cand):
            res = orig_cs(kid, cand)
            if res is None:
                return None
            S, pairs, n_inl, n_scene = res
            # report the real Sim3 with its scene support removed — models
            # an outdoor scene where only the text planes match
            return S, {"points": [], "texts": pairs["texts"]}, n_inl, 0

        lc.compute_sim3 = scene_starved
        closed = lc.run(len(slam.map.keyframes) - 1)
        assert not closed, "outdoor gate must reject a 0-scene-inlier loop"


class TestMultiLoop:
    def test_two_loops_close(self):
        """Two out-and-back excursions with per-leg amnesia close TWO loops
        online (min_kfs_between_loops honored between them)."""
        from textslam_tpu.system import TextSLAM

        n_frames = 56
        frames, dets, gt, world = synth.render_text_sequence(
            n_frames=n_frames, seed=0, kind="outback2")
        cfg = make_cfg(loop_scale_gates=(6, 4, 3))
        slam = TextSLAM(cfg)
        tr = slam.tracker
        m = slam.map

        amnesia = {"cutoff": None}

        def amnesia_hook(pt_valid):
            cut = amnesia["cutoff"]
            if cut is not None:
                n = min(m.n_points, len(pt_valid))
                pt_valid[:n] &= ~(m.pt_host[:n] < cut)
            return pt_valid

        tr.pt_candidate_hook = amnesia_hook
        tf = tr.text_frontend

        def text_amnesia_mask(n_texts):
            cut = amnesia["cutoff"]
            mask = np.ones(n_texts, bool)
            if cut is not None:
                mask &= ~(m.tx_host[:n_texts] < cut)
            return mask

        tf.pool_mask_hook = text_amnesia_mask

        # excursion structure: peaks at n/8 and 5n/8, revisits start around
        # n/2 and n. Blind each return leg to its own outbound landmarks.
        kf_marks = {}
        import jax

        for i, img in enumerate(frames):
            if i == n_frames // 8:
                kf_marks["cut1"] = len(m.keyframes)
            if i == n_frames // 4:  # descending first excursion
                amnesia["cutoff"] = kf_marks["cut1"]
            if i == n_frames // 2 + n_frames // 8:
                kf_marks["cut2"] = len(m.keyframes)
            if i == n_frames // 2 + n_frames // 4:
                amnesia["cutoff"] = kf_marks["cut2"]
            if i > 0 and i % 14 == 0:
                # the long two-loop run accumulates enough distinct compiled
                # programs to trip the upstream XLA:CPU abort (see conftest);
                # drop executables periodically — the persistent compile
                # cache makes the re-loads cheap
                jax.clear_caches()
            slam.track_monocular(img, float(i), detections=dets[i])
        amnesia["cutoff"] = None
        assert len(slam.loop_closer.closed_loops) >= 2, (
            f"closed {slam.loop_closer.closed_loops}")
        kts = np.array([kf.timestamp for kf in m.keyframes])
        kposes = np.stack([m.kf_pose[kf.kid] for kf in m.keyframes])
        ate = synth.ate_rmse(kts, kposes, gt)
        assert ate < 0.06, f"multi-loop KF ATE {ate}"
