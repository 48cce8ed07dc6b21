"""Fast unit tests for the faithful loop-closing logic (no rendering):
GetThreshWordsNum, DetectLoop voting/guards, per-experiment accept gates.
References: src/loopClosing.cc:25-42 (ctor thresholds), :54-117 (Run),
:119-304 (DetectLoop), :596-667 (GetThreshWordsNum).
"""

import dataclasses

import numpy as np
import pytest

from textslam_tpu.config import (TextSLAMConfig, CameraConfig, LoopConfig,
                                 Experiment)
from textslam_tpu.mapper.state import SlamMap, Keyframe, TEXT_GOOD
from textslam_tpu.loop.closing import LoopCloser


def make_cfg(experiment=Experiment.INDOOR_LOOP_A, **loop_over):
    return TextSLAMConfig(
        experiment=experiment,
        camera=CameraConfig(fx=400.0, fy=400.0, cx=160.0, cy=120.0,
                            width=320, height=240, fps=10.0),
        loop=LoopConfig(**loop_over),
    )


def make_map(cfg, n_kfs):
    m = SlamMap(cfg)
    T0 = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
    for k in range(n_kfs):
        kf = Keyframe(
            kid=k, frame_id=k * 5, timestamp=float(k * 5),
            kp_uv=np.zeros((8, 2), np.float32), kp_level=np.zeros(8, np.int32),
            kp_angle=np.zeros(8, np.float32), kp_desc=np.zeros((8, 8), np.uint32),
            kp_valid=np.ones(8, bool), kp_point=np.full(8, -1, np.int32),
            obs_good=np.zeros(8, bool), det_object=np.full(8, -1, np.int32),
        )
        m.add_keyframe(kf, T0)
    return m


class TestThreshWords:
    def test_needs_more_than_n_covisible(self):
        cfg = make_cfg()
        m = make_map(cfg, 20)
        lc = LoopCloser(cfg, m)
        # KF 19 covisible with only 5 KFs -> not enough (reference needs > 10)
        for k in range(14, 19):
            m.M1[19, k] = m.M1[k, 19] = 10
        thresh, connects, enough = lc._thresh_words(19)
        assert not enough

    def test_threshold_is_m2_of_last_top_covisible(self):
        cfg = make_cfg(num_covis_for_thresh=3)
        m = make_map(cfg, 12)
        lc = LoopCloser(cfg, m)
        kid = 11
        # covisibility weights: KFs 10,9,8,7 with M1 40,30,20,10
        for k, w in ((10, 40), (9, 30), (8, 20), (7, 10)):
            m.M1[kid, k] = m.M1[k, kid] = w
        # M2 counts for those KFs
        for k, w in ((10, 6), (9, 5), (8, 4), (7, 3)):
            m.M2[kid, k] = m.M2[k, kid] = w
        thresh, connects, enough = lc._thresh_words(kid)
        assert enough
        # top-3 by M1 = [10, 9, 8]; vnums[-1] = M2 of KF 8 = 4
        assert thresh == 4

    def test_vconnects_is_two_hop_not_direct(self):
        cfg = make_cfg(num_covis_for_thresh=2)
        m = make_map(cfg, 10)
        lc = LoopCloser(cfg, m)
        kid = 9
        m.M1[kid, 8] = m.M1[8, kid] = 5
        m.M1[kid, 7] = m.M1[7, kid] = 5
        m.M1[kid, 6] = m.M1[6, kid] = 5
        # KF 8 covisible with KF 2 (2-hop from kid, not direct)
        m.M1[8, 2] = m.M1[2, 8] = 3
        thresh, connects, enough = lc._thresh_words(kid)
        assert enough
        assert 2 in connects
        assert 8 not in connects  # direct covisible never joins vConnects


class TestDetect:
    def _setup(self, cfg, n_kfs=14):
        m = make_map(cfg, n_kfs)
        lc = LoopCloser(cfg, m)
        return m, lc

    def test_votes_and_guards(self):
        cfg = make_cfg()  # indoor: thmin 1, no double check
        m, lc = self._setup(cfg)
        kid = 13
        # old KF 2 observes two GOOD texts with the same strings the current
        # KF observes; KF 3 observes only one
        for i, s in enumerate(["EXIT", "HOTEL"]):
            tid = m.add_text(2, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                             s, 0.9, 0, state=TEXT_GOOD)
            m.add_text_observation(2, tid, i)
            if i == 0:
                m.add_text_observation(3, tid, 0)
        # current KF's own texts (same strings, different objects)
        for i, s in enumerate(["EXIT", "HOTEL"]):
            tid = m.add_text(kid, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                             s, 0.9, 0, state=TEXT_GOOD)
            m.add_text_observation(kid, tid, i)
        # note: add_text_observation maintains M2 incrementally; KF 2/3 are
        # NOT M1/M2/M3-covisible with kid (different objects) -> eligible
        out = lc.detect(kid, min_words=1, connects=frozenset())
        # KF2: votes=2, distinct=2 -> passes strict >1; KF3: votes=1 -> break
        assert out == [2]

    def test_exact_match_threshold(self):
        """A perfect (1.0) best score must not let 2/3-similar strings vote
        (reference: Scoreth = ScoreMax when ScoreMax == 1.0)."""
        cfg = make_cfg()
        m, lc = self._setup(cfg)
        kid = 13
        t1 = m.add_text(2, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                        "ABCDEF", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(2, t1, 0)
        t2 = m.add_text(3, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                        "ABCDEX", 0.9, 0, state=TEXT_GOOD)  # 5/6 similar
        m.add_text_observation(3, t2, 0)
        tq = m.add_text(kid, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                        "ABCDEF", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(kid, tq, 0)
        # with min_words=0: KF2 (exact) votes 1 > 0; KF3 must NOT vote
        out = lc.detect(kid, min_words=0, connects=frozenset())
        assert 2 in out and 3 not in out

    def test_covisible_excluded(self):
        cfg = make_cfg()
        m, lc = self._setup(cfg)
        kid = 13
        t1 = m.add_text(2, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                        "EXIT", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(2, t1, 0)
        tq = m.add_text(kid, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                        "EXIT", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(kid, tq, 0)
        m.M1[kid, 2] = m.M1[2, kid] = 7  # make KF2 covisible
        out = lc.detect(kid, min_words=0, connects=frozenset())
        assert 2 not in out

    def test_hash_strings_skipped(self):
        cfg = make_cfg()
        m, lc = self._setup(cfg)
        kid = 13
        t1 = m.add_text(2, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                        "AB#CD", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(2, t1, 0)
        tq = m.add_text(kid, np.zeros(3, np.float32), np.zeros((4, 2), np.float32),
                        "AB#CD", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(kid, tq, 0)
        out = lc.detect(kid, min_words=0, connects=frozenset())
        assert out == []


class TestAcceptGates:
    def _run_with_fakes(self, cfg, n_inl, n_scene):
        m = make_map(cfg, 25)
        lc = LoopCloser(cfg, m)
        lc._thresh_words = lambda kid: (1, set(), True)
        lc.detect = lambda kid, mw, con: [2]
        lc.compute_sim3 = lambda kid, cand: (
            np.array([1, 0, 0, 0, 0, 0, 0, 1], np.float32),
            {"points": [], "texts": []}, n_inl, n_scene)
        lc.correct = lambda *a, **k: None
        return lc.run(24)

    def test_indoor_accepts_over_25(self):
        cfg = make_cfg(Experiment.INDOOR_LOOP_L)
        assert self._run_with_fakes(cfg, n_inl=26, n_scene=0)
        assert not self._run_with_fakes(cfg, n_inl=25, n_scene=0)  # strict >

    def test_outdoor_needs_scene_inliers(self):
        cfg = make_cfg(Experiment.OUTDOOR)
        assert not self._run_with_fakes(cfg, n_inl=100, n_scene=9)
        assert self._run_with_fakes(cfg, n_inl=100, n_scene=10)

    def test_indoor_a_candidate_scene_gate(self):
        """INDOOR_LOOP_A requires nInliers_Scene >= 8 at candidate-selection
        time (Th_nInliers_Scene, src/loopClosing.cc:39,354)."""
        cfg = make_cfg(Experiment.INDOOR_LOOP_A)
        assert not self._run_with_fakes(cfg, n_inl=100, n_scene=7)
        assert self._run_with_fakes(cfg, n_inl=100, n_scene=8)

    def test_per_experiment_constants(self):
        assert make_cfg(Experiment.OUTDOOR).loop_thmin_match_words == 2
        assert make_cfg(Experiment.INDOOR_LOOP_A).loop_thmin_match_words == 1
        assert make_cfg(Experiment.OUTDOOR).loop_double_check_visible
        assert not make_cfg(Experiment.INDOOR_LOOP_L).loop_double_check_visible
        assert make_cfg(Experiment.INDOOR_LOOP_A).loop_th_inliers_scene == 8
        assert make_cfg(Experiment.INDOOR_LOOP_L).loop_th_inliers_scene == -1
