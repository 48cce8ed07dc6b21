"""Landmark culling lifecycle (VERDICT r2 missing #1/#2).

- Scene points: observations flagged bad by BA chi2 gating demote the point
  to FLAG_BAD (mpPtsCondUpdate, src/tracking.cc:845, :2215-2231), removing
  it from matching and future BA problems.
- Text objects: IMMATURE objects mature at FRAME cadence (TextUpdate,
  src/tracking.cc:457); a theta-solver failure demotes them to BAD
  permanently (:1943-1946); promotion needs NumObvs >= 4 frame observations
  with a stable normal (:1949-1958).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from textslam_tpu.config import TextSLAMConfig, CameraConfig
from textslam_tpu.mapper.state import (SlamMap, Keyframe, TEXT_GOOD,
                                       TEXT_IMMATURE, TEXT_BAD)
from textslam_tpu.frontend.tracking import Tracker
from textslam_tpu.frontend.text import TextFrontend
import synth


def make_cfg(**over):
    return TextSLAMConfig(
        camera=CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                            width=320, height=240, fps=10.0),
        **over,
    )


def make_kf(kid, frame_id, n=32):
    return Keyframe(
        kid=kid, frame_id=frame_id, timestamp=float(frame_id),
        kp_uv=np.zeros((n, 2), np.float32), kp_level=np.zeros(n, np.int32),
        kp_angle=np.zeros(n, np.float32), kp_desc=np.zeros((n, 8), np.uint32),
        kp_valid=np.ones(n, bool), kp_point=np.full(n, -1, np.int32),
        obs_good=np.zeros(n, bool),
    )


class TestPointCulling:
    def test_bad_obs_demotes_point(self):
        """A single BA-gated-bad observation marks the point FLAG_BAD
        (src/tracking.cc:2222-2228: any !vGoodObv entry -> pt->FLAG_BAD)."""
        cfg = make_cfg(no_text=True)
        m = SlamMap(cfg)
        ident = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        m.add_keyframe(make_kf(0, 0), ident)
        m.add_keyframe(make_kf(1, 5), ident)
        p0 = m.add_point(0, np.array([0, 0, 1.0], np.float32), 1.0,
                         np.zeros(8, np.uint32))
        p1 = m.add_point(0, np.array([0.1, 0, 1.0], np.float32), 1.0,
                         np.zeros(8, np.uint32))
        m.add_observation(0, 0, p0)
        m.add_observation(1, 0, p0)
        m.add_observation(0, 1, p1)
        m.add_observation(1, 1, p1)
        # BA gate flags p1's observation in KF1 as an outlier
        m.keyframes[1].obs_good[1] = False
        n_bad = m.cull_bad_points([0, 1])
        assert n_bad == 1
        assert not m.pt_bad[p0]
        assert m.pt_bad[p1]
        # idempotent: a second pass demotes nothing new
        assert m.cull_bad_points([0, 1]) == 0

    def test_unobserved_keypoints_do_not_cull(self):
        """obs_good=False on keypoints with NO bound point is the pool
        default, not a bad observation."""
        cfg = make_cfg(no_text=True)
        m = SlamMap(cfg)
        ident = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        m.add_keyframe(make_kf(0, 0), ident)
        p0 = m.add_point(0, np.array([0, 0, 1.0], np.float32), 1.0,
                         np.zeros(8, np.uint32))
        m.add_observation(0, 0, p0)
        assert m.cull_bad_points([0]) == 0
        assert not m.pt_bad[p0]

    def test_culled_point_leaves_matching_pool(self):
        """Injected outlier triangulations leave the matching pool after the
        next keyframe's BA gating (the e2e half of VERDICT r2 next #2)."""
        from textslam_tpu.system import TextSLAM

        frames, poses = synth.render_sequence(n_frames=14, seed=3)
        cfg = TextSLAMConfig(
            no_text=True,
            camera=CameraConfig(fx=synth.FX, fy=synth.FY, cx=synth.CX,
                                cy=synth.CY, width=synth.W, height=synth.H,
                                fps=10.0))
        slam = TextSLAM(cfg)
        injected = []
        for i, img in enumerate(frames):
            slam.track_monocular(img, float(i))
            m = slam.map
            if i == 7 and len(m.keyframes) >= 2:
                # corrupt real, multi-KF-observed points: bend the host ray
                # so NO inverse depth satisfies the observations anymore (a
                # recoverable rho error would just be re-solved by BA — a
                # wrong ray models a wrong association/triangulation)
                cand = [p for p in range(m.n_points)
                        if m.pt_n_obs[p] >= 2 and not m.pt_bad[p]][:8]
                assert cand, "fixture produced no multi-observation points"
                for p in cand:
                    m.pt_ray[p, 0] += 0.06  # ~25 px at f=420
                injected = cand
        m = slam.map
        assert injected
        culled = [p for p in injected if m.pt_bad[p]]
        # BA gating + mpPtsCondUpdate must have removed the corrupted points
        assert len(culled) >= len(injected) // 2, (
            f"only {len(culled)}/{len(injected)} corrupted points culled")
        # and tracking survived
        assert slam.tracker.state == 1


class _FakeFrame:
    def __init__(self):
        self.pose = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        self.pyr_data = np.zeros((4, 8, 8, 3), np.float32)
        self.pyr_shapes = np.array([[8, 8]] * 4, np.int32)
        self.pyr_dev = None


def _frontend_with_immature(monkeypatch, theta_result):
    """TextFrontend over a 1-KF map holding one IMMATURE object, with the
    theta solver and the geometric gates stubbed."""
    cfg = make_cfg()
    m = SlamMap(cfg)
    ident = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
    m.add_keyframe(make_kf(0, 0), ident)
    tf = TextFrontend(cfg, m, tracker=None)
    tid = m.add_text(0, np.array([0, 0, -1.0], np.float32),
                     np.zeros((4, 2), np.float32), "CAFE", 0.9, 0,
                     state=TEXT_IMMATURE)
    theta, ok = theta_result

    def batch_stub(imm, frame, geo_dev=None, pose_dev=None):
        # new contract: DEVICE [n, 12] packed (theta 3 | H 9); solver
        # failure is encoded as a non-finite/degenerate theta row
        n = len(imm)
        th = (np.tile(theta, (n, 1)) if ok
              else np.zeros((n, 3), np.float32))
        H = np.tile(np.eye(3, dtype=np.float32).reshape(1, 9), (n, 1))
        return jnp.asarray(np.concatenate([th, H], axis=1))

    monkeypatch.setattr(tf, "_theta_optimize_batch", batch_stub)
    monkeypatch.setattr(
        tf, "_gates",
        lambda pose, frame: (np.ones(m.n_texts, bool), np.ones(m.n_texts, bool)))
    return tf, m, tid


class TestImmatureLifecycle:
    def test_solver_failure_demotes_to_bad(self, monkeypatch):
        """ThetaOptimMultiFs failure -> TEXTBAD (src/tracking.cc:1943-1946);
        the object leaves the lifecycle permanently."""
        theta = np.array([0, 0, -1.0], np.float32)
        tf, m, tid = _frontend_with_immature(monkeypatch, (theta, False))
        tf._update_immature(_FakeFrame())
        assert m.tx_state[tid] == TEXT_BAD
        # BAD is terminal: further frames never resurrect it
        tf._update_immature(_FakeFrame())
        assert m.tx_state[tid] == TEXT_BAD

    def test_promotion_at_frame_cadence(self, monkeypatch):
        """NumObvs counts FRAMES (not keyframes): 4 observable frames with a
        stable theta promote to GOOD (src/tracking.cc:1934,1949-1958)."""
        theta = np.array([0, 0, -1.0], np.float32)
        tf, m, tid = _frontend_with_immature(monkeypatch, (theta, True))
        for i in range(3):
            tf._update_immature(_FakeFrame())
            assert m.tx_state[tid] == TEXT_IMMATURE, f"promoted after {i+1}"
            assert m.tx_num_obvs[tid] == i + 1
        tf._update_immature(_FakeFrame())
        assert m.tx_state[tid] == TEXT_GOOD
        assert m.tx_num_obvs[tid] == 4

    def test_unstable_theta_blocks_promotion(self, monkeypatch):
        """cos(theta_new, theta_old) < 0.9 keeps the object IMMATURE even
        with enough observations."""
        tf, m, tid = _frontend_with_immature(
            monkeypatch, (np.array([0, 0, -1.0], np.float32), True))
        thetas = [np.array([0, 0, -1.0], np.float32),
                  np.array([0.8, 0, -1.0], np.float32)]
        calls = {"n": 0}

        def flip(imm, frame, geo_dev=None, pose_dev=None):
            calls["n"] += 1
            th = thetas[calls["n"] % 2]
            n = len(imm)
            H = np.tile(np.eye(3, dtype=np.float32).reshape(1, 9), (n, 1))
            return jnp.asarray(np.concatenate([np.tile(th, (n, 1)), H], axis=1))

        tf._theta_optimize_batch = flip
        for _ in range(6):
            tf._update_immature(_FakeFrame())
        assert m.tx_state[tid] == TEXT_IMMATURE

    def test_invisible_object_not_counted(self, monkeypatch):
        """Objects failing the geometric gate neither mature nor demote
        (TextJudgeSingle gate, src/tracking.cc:1928-1931)."""
        theta = np.array([0, 0, -1.0], np.float32)
        tf, m, tid = _frontend_with_immature(monkeypatch, (theta, True))
        tf._gates = lambda pose, frame: (np.zeros(m.n_texts, bool),
                                         np.zeros(m.n_texts, bool))
        tf._update_immature(_FakeFrame())
        assert m.tx_num_obvs[tid] == 0
        assert m.tx_state[tid] == TEXT_IMMATURE
