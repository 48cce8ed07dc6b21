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


class TestLoopLandmarks:
    """GetLoopsLandmarkers (src/loopClosing.cc:1045-1089): the loop-side set
    is the landmarks observed by the loop KF and its M1-covisible KFs — not
    an id-range proxy (VERDICT r3 missing #2)."""

    def test_covisible_observed_set(self):
        cfg = make_cfg()
        m = make_map(cfg, 6)
        lc = LoopCloser(cfg, m)
        loop_kid = 1
        # points: p0 observed by KF0, p1 by KF1, p3 by KF3 only
        p0 = m.add_point(0, np.array([0, 0, 1], np.float32), 0.5,
                         np.zeros(8, np.uint32))
        m.add_observation(0, 0, p0)
        p1 = m.add_point(1, np.array([0, 0, 1], np.float32), 0.5,
                         np.zeros(8, np.uint32))
        m.add_observation(1, 0, p1)
        p3 = m.add_point(3, np.array([0, 0, 1], np.float32), 0.5,
                         np.zeros(8, np.uint32))
        m.add_observation(3, 0, p3)
        # KF0 is M1-covisible with the loop KF; KF3 is not
        m.M1[1, 0] = m.M1[0, 1] = 4
        # text: tA observed by loop KF, tB only by KF4
        tA = m.add_text(1, np.array([0, 0, -0.5], np.float32),
                        np.zeros((4, 2), np.float32), "EXIT", 0.9, 0,
                        state=TEXT_GOOD)
        m.add_text_observation(1, tA, 0)
        tB = m.add_text(4, np.array([0, 0, -0.5], np.float32),
                        np.zeros((4, 2), np.float32), "EXIT", 0.9, 0,
                        state=TEXT_GOOD)
        m.add_text_observation(4, tB, 0)
        pids, tids = lc._loop_landmarks(5, loop_kid)
        assert set(pids.tolist()) == {p0, p1}
        assert tids == [tA]
        # a point later seen by the loop KF's covisible KF joins the set even
        # when hosted AFTER the loop KF (the old proxy excluded it)
        m.add_observation(0, 1, p3)
        pids, _ = lc._loop_landmarks(5, loop_kid)
        assert set(pids.tolist()) == {p0, p1, p3}


class TestSearchAndFuseText:
    """SearchAndFuse_Text (src/loopClosing.cc:1290-1385): a duplicated text
    object NOT in the Sim3 inlier pair set fuses by label-mask overlap
    (VERDICT r3 missing #1)."""

    def _setup(self):
        cfg = make_cfg()
        m = make_map(cfg, 6)
        lc = LoopCloser(cfg, m)
        from textslam_tpu.frontend.text import TextFrontend
        import types

        tf = TextFrontend(cfg, m, None)
        lc.tracker = types.SimpleNamespace(text_frontend=tf)
        return cfg, m, lc

    def test_duplicate_fuses_by_label_overlap(self):
        cfg, m, lc = self._setup()
        quad = np.array([[100, 100], [200, 100], [200, 160], [100, 160]],
                        np.float32)
        theta = np.array([0, 0, -0.5], np.float32)  # plane z = 2 (identity pose)
        # loop-side object hosted at the loop KF
        tA = m.add_text(1, theta, quad, "EXIT", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(1, tA, 0)
        # duplicate hosted at window KF 4, observed there — NOT in any Sim3
        # pair set (we call the fusion pass directly)
        tB = m.add_text(4, theta, quad.copy(), "EXIT", 0.8, 0, state=TEXT_GOOD)
        m.add_text_observation(4, tB, 0)
        ident = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        n = lc._search_and_fuse_text(5, 1, {4}, {4: ident}, [tA])
        assert n == 1
        assert not m.tx_valid[tB]
        # the observation rewired to the surviving loop object
        assert (4, tA) in m.tx_obs
        assert m.tx_valid[tA]

    def test_no_overlap_no_fuse(self):
        cfg, m, lc = self._setup()
        quad = np.array([[100, 100], [200, 100], [200, 160], [100, 160]],
                        np.float32)
        far_quad = quad + np.array([150, 60], np.float32)  # disjoint box
        theta = np.array([0, 0, -0.5], np.float32)
        tA = m.add_text(1, theta, quad, "EXIT", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(1, tA, 0)
        tB = m.add_text(4, theta, far_quad, "EXIT", 0.8, 0, state=TEXT_GOOD)
        m.add_text_observation(4, tB, 0)
        ident = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        n = lc._search_and_fuse_text(5, 1, {4}, {4: ident}, [tA])
        assert n == 0
        assert m.tx_valid[tB]

    def test_negative_depth_loop_box_skipped(self):
        """flag_pred: a loop box behind the corrected camera paints no label."""
        cfg, m, lc = self._setup()
        quad = np.array([[100, 100], [200, 100], [200, 160], [100, 160]],
                        np.float32)
        theta = np.array([0, 0, -0.5], np.float32)
        tA = m.add_text(1, theta, quad, "EXIT", 0.9, 0, state=TEXT_GOOD)
        m.add_text_observation(1, tA, 0)
        tB = m.add_text(4, theta, quad.copy(), "EXIT", 0.8, 0, state=TEXT_GOOD)
        m.add_text_observation(4, tB, 0)
        # corrected pose translated far along +z: plane behind the camera
        behind = np.array([1, 0, 0, 0, 0, 0, 10.0], np.float32)
        n = lc._search_and_fuse_text(5, 1, {4}, {4: behind}, [tA])
        assert n == 0
        assert m.tx_valid[tB]


def _lev_oracle(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        new = [i + 1]
        for j, cb in enumerate(b):
            new.append(min(dp[j + 1] + 1, new[-1] + 1, dp[j] + (ca != cb)))
        dp = new
    return dp[-1]


class TestLongStrings:
    """detect() must score FULL strings (src/loopClosing.cc:190-193) — no
    16-codepoint truncation (VERDICT r3 weak #3): tiered device length from
    the per-call distribution, native arbitrary-length routing past the cap,
    normalization by true lengths."""

    LONG_A = "ESTABLISHED-1927-GRAND-CENTRAL-HARDWARE"   # 39 cps
    LONG_B = "ESTABLISHED-1927-GRAND-CENTRAL-HARDWARE"   # exact duplicate
    LONG_C = "ESTABLISHED-1987-GRAND-CENTRAL-HARDWARES"  # 3 edits, 40 cps

    def _detect_with(self, cfg, cur_string, old_string):
        m = make_map(cfg, 14)
        lc = LoopCloser(cfg, m)
        kid = 13
        t_old = m.add_text(2, np.zeros(3, np.float32),
                           np.zeros((4, 2), np.float32), old_string, 0.9, 0,
                           state=TEXT_GOOD)
        m.add_text_observation(2, t_old, 0)
        m.add_text_observation(3, t_old, 0)
        t_cur = m.add_text(kid, np.zeros(3, np.float32),
                           np.zeros((4, 2), np.float32), cur_string, 0.9, 0,
                           state=TEXT_GOOD)
        m.add_text_observation(kid, t_cur, 0)
        # one shared word: votes must strictly exceed min_words (=0 here)
        return lc.detect(kid, min_words=0, connects=frozenset())

    def test_exact_long_match_found_device_tier(self):
        # 39 cps fits the 64 device tier — no truncation, exact match scores
        # 1.0 and both observing KFs vote
        cfg = make_cfg()
        out = self._detect_with(cfg, self.LONG_A, self.LONG_B)
        assert 2 in out or 3 in out

    def test_near_match_scores_true_lengths_native_path(self):
        # cap the device tier below the string length: the native
        # arbitrary-length path must produce oracle scores
        cfg = make_cfg(lev_device_max_len=16)
        d = _lev_oracle(self.LONG_A, self.LONG_C)
        score = (max(len(self.LONG_A), len(self.LONG_C)) - d) / max(
            len(self.LONG_A), len(self.LONG_C))
        assert score > cfg.loop_score_thresh  # 3 edits over 40 cps ~ 0.925
        out = self._detect_with(cfg, self.LONG_A, self.LONG_C)
        assert 2 in out or 3 in out

    def test_truncation_would_have_passed_this(self):
        """Two strings identical in the first 16 codepoints but different
        beyond must NOT score 1.0 (the old truncation bug made them exact)."""
        a = "SAME-PREFIX-0123-BUT-THEN-COMPLETELY-DIFFERENT"
        b = "SAME-PREFIX-0123-XXXXXXXXXXXXXXXXXXXXXXXXXXXXX"
        d = _lev_oracle(a, b)
        true_score = (max(len(a), len(b)) - d) / max(len(a), len(b))
        assert true_score < 0.51  # below the indoor keep threshold
        cfg = make_cfg()
        out = self._detect_with(cfg, a, b)
        assert out == []

    def test_device_and_native_paths_agree(self):
        from textslam_tpu.ops import levenshtein
        from textslam_tpu import native
        import jax.numpy as jnp

        words_q = [self.LONG_A, "EXIT", "CAFE-DELUXE-24H"]
        words_t = [self.LONG_C, "EXIT", "CAFE-DELUXE-24H", "HOTEL"]
        L = 64
        qa, qlen = levenshtein.encode(words_q, L)
        ta, tlen = levenshtein.encode(words_t, L)
        d_dev = np.asarray(levenshtein.levenshtein_matrix(
            jnp.asarray(qa), jnp.asarray(qlen), jnp.asarray(ta), jnp.asarray(tlen)))
        d_nat = native.levenshtein_batch(qa, qlen, ta, tlen)
        want = np.array([[_lev_oracle(q, t) for t in words_t] for q in words_q])
        np.testing.assert_array_equal(d_dev, want)
        np.testing.assert_array_equal(d_nat, want)


class TestDetectPoolScale:
    """detect() at pool scale (VERDICT r4 next #8): max_texts live strings x
    hundreds of KFs, vote correctness pinned against an independent python
    oracle, with a wall-clock guard on the batched scoring path."""

    def test_votes_correct_at_512_texts_400_kfs(self):
        import time

        cfg = make_cfg()
        K = 400
        m = make_map(cfg, K)
        lc = LoopCloser(cfg, m)
        kid = K - 1
        rng = np.random.default_rng(11)
        alpha = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"))

        def rand_string():
            n = int(rng.integers(5, 19))
            return "".join(rng.choice(alpha, n))

        # fill the text pool to ~its cap with strings hosted across old KFs;
        # a slice of them duplicates the current KF's strings so real
        # candidates exist
        cur_strings = [rand_string() for _ in range(8)]
        n_old = cfg.map.max_texts - len(cur_strings)
        q = np.zeros((4, 2), np.float32)
        for i in range(n_old):
            host = int(rng.integers(0, K - 40))
            if i < 24:
                s = cur_strings[i % len(cur_strings)]  # exact duplicates
            elif i < 40:
                base = cur_strings[i % len(cur_strings)]
                s = base[:-1] + ("X" if base[-1] != "X" else "Y")  # near
            else:
                s = rand_string()
            tid = m.add_text(host, np.zeros(3, np.float32), q, s, 0.9, 0,
                             state=TEXT_GOOD)
            assert tid >= 0
            m.add_text_observation(host, tid, 0)
            # some objects observed by a second old KF (more vote mass)
            if i % 3 == 0 and host + 1 < K - 40:
                m.add_text_observation(host + 1, tid, 1)
        cur_tids = []
        for i, s in enumerate(cur_strings):
            tid = m.add_text(kid, np.zeros(3, np.float32), q, s, 0.9, 0,
                             state=TEXT_GOOD)
            m.add_text_observation(kid, tid, i)
            cur_tids.append(tid)
        assert m.n_texts == cfg.map.max_texts

        t0 = time.perf_counter()
        out = lc.detect(kid, min_words=1, connects=frozenset())
        dt = time.perf_counter() - t0
        # second call = steady path (first may compile the Levenshtein tier)
        t0 = time.perf_counter()
        out2 = lc.detect(kid, min_words=1, connects=frozenset())
        dt2 = time.perf_counter() - t0
        assert out2 == out
        print(f"[pool-scale detect] {m.n_texts} texts x {K} KFs: "
              f"first {dt*1e3:.0f} ms, steady {dt2*1e3:.0f} ms")
        assert dt2 < 10.0, f"steady detect took {dt2:.1f}s at pool scale"

        # ---- independent oracle (python Levenshtein + explicit voting) ----
        all_tids = [t for t in range(m.n_texts)
                    if m.tx_valid[t] and m.tx_state[t] != TEXT_GOOD + 2]
        scores = np.zeros((len(cur_tids), len(all_tids)))
        for qi, qt in enumerate(cur_tids):
            for ti, tt in enumerate(all_tids):
                if tt == qt:
                    scores[qi, ti] = -1.0
                    continue
                a, b = m.tx_string[qt], m.tx_string[tt]
                ml = max(len(a), len(b))
                scores[qi, ti] = (ml - _lev_oracle(a, b)) / ml
        best = scores.max(axis=1)
        keep = np.where(best >= 1.0, 1.0,
                        np.maximum(best * (2.0 / 3.0),
                                   cfg.loop_score_thresh))
        keep = np.where(best < cfg.loop.min_str_score, np.inf, keep)
        match = scores >= keep[:, None]
        eligible = np.ones(K, bool)
        eligible[kid] = False
        eligible &= ~((m.M1[kid, :K] > 0) | (m.M2[kid, :K] > 0)
                      | (m.M3[kid, :K] > 0))
        inc = m.tx_inc[np.asarray(all_tids)[:, None],
                       np.arange(K)[None, :]] & eligible[None, :]
        votes = match.sum(axis=0).astype(np.int64) @ inc
        distinct = (match.any(axis=0)[:, None] & inc).sum(axis=0)
        order = np.argsort(-votes, kind="stable")
        expected = []
        for k in order:
            if votes[k] <= 1:
                break
            if distinct[k] <= 1:
                continue
            if len(expected) >= cfg.loop.top_candidates:
                break
            expected.append(int(k))
        assert out == expected, f"detect {out} != oracle {expected}"
        assert len(expected) >= 1, "fixture produced no candidates"
