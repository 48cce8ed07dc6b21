"""End-to-end SLAM with text objects on a rendered synthetic sequence.

The SURVEY.md §7.2 M4 checkpoint: joint point + text-plane tracking/BA,
theta initialization + lifecycle, checked against exact plane ground truth.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from textslam_tpu.config import TextSLAMConfig, CameraConfig
from textslam_tpu.mapper.state import TEXT_GOOD, TEXT_BAD
import synth


def make_cfg():
    return TextSLAMConfig(
        no_text=False,
        camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX, cy=synth.CY,
                            width=synth.W, height=synth.H, fps=10.0),
    )


@pytest.fixture(scope="module")
def result():
    from textslam_tpu.system import TextSLAM

    # 24 frames -> ~8 keyframes: enough for the reference's age-gated
    # semantic demotion (host >= 5 KFs old) to clean up unobservable planes
    frames, dets, gt, world = synth.render_text_sequence(n_frames=24, seed=0)
    slam = TextSLAM(make_cfg())
    for i, img in enumerate(frames):
        slam.track_monocular(img, float(i), detections=dets[i])
    return slam, gt, world


class TestTextSLAM:
    def test_tracks_and_creates_texts(self, result):
        slam, gt, world = result
        assert slam.tracker.state == 1
        m = slam.map
        assert m.n_texts >= 2, f"only {m.n_texts} text objects created"
        good = [t for t in range(m.n_texts) if m.tx_state[t] == TEXT_GOOD]
        assert len(good) >= 1, "no GOOD text objects"

    def test_theta_matches_ground_truth(self, result):
        slam, gt, world = result
        m = slam.map
        # for each live object, compare theta direction against the GT plane
        # of the box it was created from (normals must agree; scale of theta
        # differs by map scale so compare unit normals only)
        cosines = []
        for tid in range(m.n_texts):
            if not m.tx_valid[tid] or m.tx_state[tid] != TEXT_GOOD:
                continue
            host = int(m.tx_host[tid])
            n_kf_obs = len(m.kfs_observing_text(tid))
            frame_id = m.keyframes[host].frame_id
            # find the GT plane whose projected string matches
            boxes = [b for b in world.boxes if b[2] == m.tx_string[tid]]
            if not boxes:
                continue
            z0 = world.planes[boxes[0][0]][0]
            th_gt = synth.plane_theta_in_cam(z0, gt[frame_id])
            th = m.tx_theta[tid]
            cos = abs(np.dot(th, th_gt) / (np.linalg.norm(th) * np.linalg.norm(th_gt) + 1e-12))
            cosines.append((tid, cos, n_kf_obs))
        assert len(cosines) >= 1
        # Well-observed GOOD objects (>= 3 KF observations -> at least two
        # post-promotion windowed-BA refinements) must be tightly converged.
        # Objects promoted at the reference's frame cadence (TextUpdate
        # NumObvs >= 4 frames, src/tracking.cc:1949-1958) can reach GOOD
        # near the sequence end with < 3 KF observations; they are still
        # converging under BA and self-heal/demote via the semantic counters
        # on longer runs — for them the claim is only "not a wrong basin".
        for tid, cos, n_obs in cosines:
            if n_obs >= 3:
                assert cos > 0.95, f"tid {tid} ({n_obs} KF obs) cos {cos}"
            else:
                assert cos > 0.6, f"tid {tid} wrong-basin plane: cos {cos}"
        good_frac = sum(1 for _, c, _n in cosines if c > 0.99) / len(cosines)
        assert good_frac >= 0.5, f"only {good_frac:.0%} of GOOD planes converged: {cosines}"

    def test_trajectory_accuracy(self, result):
        slam, gt, world = result
        kts = np.array([kf.timestamp for kf in slam.map.keyframes])
        kposes = np.stack([slam.map.kf_pose[kf.kid] for kf in slam.map.keyframes])
        ate = synth.ate_rmse(kts, kposes, gt)
        assert ate < 0.012, f"KF ATE with text {ate}"

    def test_observations_registered(self, result):
        slam, gt, world = result
        m = slam.map
        assert len(m.tx_obs) >= m.n_texts  # at least host observations
        # covisibility text matrices populated
        K = len(m.keyframes)
        assert m.M2[:K, :K].sum() > 0


class TestDecomposedLandmarkPass:
    """The loop-time OptimizeLandmarker decomposition (closing.py global
    refinement above SolverConfig.global_decompose_kfs): rho-only solve via
    the no-free-poses fast path + chunked per-object theta pass must agree
    with the joint single-problem path — all poses are fixed, so the
    blocks are mathematically independent (VERDICT r4 next #1)."""

    def _snapshot(self, m):
        return {
            "tx_theta": m.tx_theta.copy(),
            "pt_rho": m.pt_rho.copy(),
            "pt_bad": m.pt_bad.copy(),
            "pt_bad_obs": m.pt_bad_obs.copy(),
            "tx_bad_obs": m.tx_bad_obs.copy(),
            "obs_good": [kf.obs_good.copy() for kf in m.keyframes],
            "tx_obs_good": dict(m.tx_obs_good),
            "tx_feat_good": {k: v.copy() for k, v in m.tx_feat_good.items()},
        }

    def _restore(self, m, s):
        m.tx_theta[:] = s["tx_theta"]
        m.pt_rho[:] = s["pt_rho"]
        m.pt_bad[:] = s["pt_bad"]
        m.pt_bad_obs[:] = s["pt_bad_obs"]
        m.tx_bad_obs[:] = s["tx_bad_obs"]
        for kf, og in zip(m.keyframes, s["obs_good"]):
            kf.obs_good[:] = og
        m.tx_obs_good = dict(s["tx_obs_good"])
        m.tx_feat_good = {k: v.copy() for k, v in s["tx_feat_good"].items()}

    def test_matches_joint_path(self, result):
        slam, gt, world = result
        m = slam.map
        tf = slam.tracker.tracker_text_frontend()
        all_kids = list(range(len(m.keyframes)))
        good = [t for t in range(m.n_texts)
                if m.tx_valid[t] and m.tx_state[t] == TEXT_GOOD
                and len(m.kfs_observing_text(t)) >= 2]
        assert good, "fixture produced no multi-observed GOOD text"
        rng = np.random.default_rng(7)
        base = self._snapshot(m)
        pert = {t: (m.tx_theta[t]
                    * (1.0 + 0.02 * rng.standard_normal(3))).astype(np.float32)
                for t in good}

        # joint single-problem path (small-K default)
        for t, v in pert.items():
            m.tx_theta[t] = v
        slam.tracker._local_ba(window_kids=all_kids, fix=all_kids,
                               landmark_only=True)
        th_joint = {t: m.tx_theta[t].copy() for t in good}
        rho_joint = m.pt_rho.copy()

        # decomposed path (exactly what closing.py runs past the threshold)
        self._restore(m, base)
        for t, v in pert.items():
            m.tx_theta[t] = v
        slam.tracker._local_ba(window_kids=all_kids, fix=all_kids,
                               landmark_only=True, scene_only=True)
        n_upd = tf.landmark_theta_pass()
        assert n_upd >= 1

        live = m.pt_valid[: m.n_points] & ~m.pt_bad[: m.n_points]
        dr = np.abs(m.pt_rho[: m.n_points][live]
                    - rho_joint[: m.n_points][live]) / (
            np.abs(rho_joint[: m.n_points][live]) + 1e-9)
        assert np.median(dr) < 0.02, f"rho median rel diff {np.median(dr)}"

        # same OPTIMUM, not same LM path: the joint problem shares one
        # accept/reject schedule across all blocks, the decomposed pass
        # damps per object, so weakly-constrained objects can settle in
        # different spots legitimately. The invariant: every object the
        # JOINT path recovers to its pre-perturbation optimum (converged,
        # well-constrained) must ALSO be recovered by the decomposed pass.
        def cos_to(a, b):
            return float(np.dot(a, b)
                         / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

        checked = 0
        for t in good:
            th0 = base["tx_theta"][t]
            if cos_to(th_joint[t], th0) < 0.999:
                continue  # joint itself moved it: weakly constrained
            checked += 1
            cd = cos_to(m.tx_theta[t], th0)
            assert cd > 0.995, (
                f"tid {t}: joint recovered the optimum (cos "
                f"{cos_to(th_joint[t], th0):.4f}) but decomposed did not "
                f"({cd:.4f})")
        assert checked >= 1, "no well-constrained object to compare"
        self._restore(m, base)


class TestJointInitBA:
    def test_joint_init_ba_pipeline(self):
        """The reference-faithful JOINT init BA (pose+rho+theta in one
        PyrIniBA problem, src/optimizer.cc:56-133,1030) behind
        SolverConfig.joint_init_ba — previously dead-untested (VERDICT r2
        missing #4). A short sequence must initialize, track, and stay
        accurate with the joint path enabled; the default-vs-joint accuracy
        question is settled by the multi-seed A/B in bench_precision.py
        --mode initba (table in BASELINE.md)."""
        from textslam_tpu.system import TextSLAM
        from textslam_tpu.config import SolverConfig

        frames, dets, gt, world = synth.render_text_sequence(n_frames=12, seed=2)
        cfg = make_cfg()
        import dataclasses

        cfg = dataclasses.replace(cfg, solver=SolverConfig(joint_init_ba=True))
        slam = TextSLAM(cfg)
        for i, img in enumerate(frames):
            slam.track_monocular(img, float(i), detections=dets[i])
        assert slam.tracker.state == 1
        assert slam.map.n_texts >= 1
        kts = np.array([kf.timestamp for kf in slam.map.keyframes])
        kposes = np.stack([slam.map.kf_pose[kf.kid] for kf in slam.map.keyframes])
        ate = synth.ate_rmse(kts, kposes, gt)
        assert ate < 0.05, f"joint-init-BA ATE {ate}"
