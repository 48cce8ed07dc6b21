"""Semantic loop closing: text-string detection, Sim3 estimation, map fusion,
pose-graph + global refinement.

Re-designs src/loopClosing.{h,cc} (1,573 LoC) + src/Sim3Solver.cc:
- DetectLoop (src/loopClosing.cc:119-304): per observed text string,
  batched Levenshtein against ALL map text strings (ops.levenshtein — one
  wavefront scan for the whole [Q, T] pair matrix instead of the reference's
  double loop), candidate keep at >= max(2/3 * best, min score); KF voting
  with covisibility exclusion via the dense M1/M2/M3 matrices; top-K.
- ComputeSim3 (:306-377): 3D-3D correspondences from descriptor matches
  between the two keyframes (map points + text-plane backprojections — the
  planes supply 3D exactly as SearchMatch_Text builds FeatureConvert records,
  :738-974), batched Horn RANSAC + tangent-space refinement
  (solver.sim3_opt).
- LoopCorrect (:379-593): window pose propagation, landmark fusion
  (mapPts/mapText::Replace), Sim3 pose graph (OptimizeLoop), scene-only
  global BA, landmark-only refinement.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..config import TextSLAMConfig
from ..geometry import se3, sim3
from ..geometry.camera import unproject
from ..ops import matching, levenshtein, rasterize
from ..solver import sim3_opt
from ..mapper.state import SlamMap, TEXT_BAD


STOPWORDS = {"", "#", "-", "--"}


class LoopCloser:
    def __init__(self, cfg: TextSLAMConfig, slam_map: SlamMap):
        self.cfg = cfg
        self.map = slam_map
        self.last_loop_kid = -(10**9)
        self.tracker = None  # wired by system for global BA reuse
        self._key = jax.random.PRNGKey(cfg.seed + 2)
        self.closed_loops = []  # (cur_kid, loop_kid)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def run(self, kid: int) -> bool:
        m = self.map
        lcfg = self.cfg.loop
        if len(m.keyframes) < lcfg.min_kfs_before_loop:
            return False
        if kid - self.last_loop_kid < lcfg.min_kfs_between_loops:
            return False
        candidates = self.detect(kid)
        for cand in candidates:
            res = self.compute_sim3(kid, cand)
            if res is None:
                continue
            S_cl, pairs = res
            self.correct(kid, cand, S_cl, pairs)
            self.last_loop_kid = kid
            self.closed_loops.append((kid, cand))
            m.keyframes[kid].loop_edges.append(cand)
            m.keyframes[cand].loop_edges.append(kid)
            return True
        return False

    # ------------------------------------------------------------------
    def detect(self, kid: int) -> List[int]:
        """Text-string loop candidates (DetectLoop)."""
        m = self.map
        lcfg = self.cfg.loop
        cur_tids = [t for (k, t) in m.tx_obs if k == kid
                    and m.tx_valid[t] and (m.tx_string[t] or "").strip() not in STOPWORDS]
        if not cur_tids:
            return []
        all_tids = [t for t in range(m.n_texts)
                    if m.tx_valid[t] and m.tx_state[t] != TEXT_BAD
                    and (m.tx_string[t] or "").strip() not in STOPWORDS]
        if not all_tids:
            return []
        L = 16
        qa, qlen = levenshtein.encode([m.tx_string[t] for t in cur_tids], L)
        ta, tlen = levenshtein.encode([m.tx_string[t] for t in all_tids], L)
        d = levenshtein.levenshtein_matrix(
            jnp.asarray(qa), jnp.asarray(qlen), jnp.asarray(ta), jnp.asarray(tlen))
        scores = np.asarray(levenshtein.similarity_scores(d, jnp.asarray(qlen), jnp.asarray(tlen)))

        # covisibility exclusion set (vConnects): KFs sharing any landmark
        K = len(m.keyframes)
        excl = set(int(c) for c in m.covisible_kfs(kid))
        excl.add(kid)
        # also exclude temporal neighbours
        for k in range(max(0, kid - 3), min(K, kid + 4)):
            excl.add(k)

        thresh_min = self.cfg.loop_score_thresh
        votes = np.zeros(K, np.int32)
        for qi, cur_t in enumerate(cur_tids):
            best = scores[qi].max()
            keep = max(2.0 / 3.0 * best, thresh_min)
            for ti, cand_t in enumerate(all_tids):
                if cand_t == cur_t or scores[qi, ti] < keep:
                    continue
                for okf in m.kfs_observing_text(cand_t):
                    if okf not in excl:
                        votes[okf] += 1
        min_words = self._min_matched_words(kid)
        order = np.argsort(-votes)
        out = [int(k) for k in order[: lcfg.top_candidates] if votes[k] >= min_words]
        return out

    def _min_matched_words(self, kid: int) -> int:
        """Adaptive word-count threshold from covisible text sharing
        (GetThreshWordsNum, src/loopClosing.cc:596-667): require at least as
        many matched words as a typical covisible KF shares, floored at 1."""
        m = self.map
        K = len(m.keyframes)
        covis = m.M2[kid, :K]
        shared = covis[covis > 0]
        if len(shared) == 0:
            return 1
        return max(1, int(round(0.5 * float(np.median(shared)))))

    # ------------------------------------------------------------------
    def compute_sim3(self, kid: int, cand: int):
        """3D-3D correspondence + Sim3 RANSAC + refinement."""
        m = self.map
        cam = self.cfg.camera
        lcfg = self.cfg.loop
        kf_c = m.keyframes[kid]
        kf_l = m.keyframes[cand]

        # (a) map-point-backed features in each KF (SearchMatch_Other analog)
        def kf_3d(kf):
            sel = np.nonzero((kf.kp_point >= 0) & kf.obs_good & kf.kp_valid)[0]
            pids = kf.kp_point[sel]
            ok = m.pt_valid[pids] & ~m.pt_bad[pids]
            sel, pids = sel[ok], pids[ok]
            xyz_w = m.point_world(pids)
            p_cam = np.asarray(se3.apply(jnp.asarray(m.kf_pose[kf.kid]), jnp.asarray(xyz_w.astype(np.float32))))
            return sel, pids, p_cam

        sel_c, pid_c, P_c = kf_3d(kf_c)
        sel_l, pid_l, P_l = kf_3d(kf_l)

        # (b) text-plane-backed features (SearchMatch_Text analog): keypoints
        # inside an observed text box get 3D from the plane
        def text_3d(kf):
            out_sel, out_p, out_tid = [], [], []
            for (k, tid), det_idx in m.tx_obs.items():
                if k != kf.kid or not m.tx_valid[tid] or m.tx_state[tid] == TEXT_BAD:
                    continue
                host = int(m.tx_host[tid])
                quad = (m.tx_quad[tid] if host == kf.kid
                        else kf.det_quads[det_idx] if kf.det_quads is not None and det_idx < len(kf.det_quads)
                        else None)
                if quad is None:
                    continue
                sel = np.nonzero(kf.kp_valid)[0]
                inq = np.asarray(rasterize.point_in_quad(jnp.asarray(kf.kp_uv[sel]), jnp.asarray(quad)))
                sel = sel[inq]
                if len(sel) == 0:
                    continue
                # backproject via the plane: ray in kf frame; need theta in kf
                # frame: theta hosted at host -> transform via T_kf,host
                from ..geometry.plane import transform_theta

                T_hk = se3.relative(jnp.asarray(m.kf_pose[host]), jnp.asarray(m.kf_pose[kf.kid]))
                th_k = np.asarray(transform_theta(jnp.asarray(m.tx_theta[tid]), T_hk))
                rays = np.asarray(unproject(jnp.asarray(kf.kp_uv[sel]), cam.fx, cam.fy, cam.cx, cam.cy))
                rho = -(rays * th_k).sum(-1)
                okz = rho > 1e-4
                p = rays[okz] / rho[okz][:, None]
                out_sel.extend(sel[okz])
                out_p.extend(p)
                out_tid.extend([tid] * int(okz.sum()))
            if not out_sel:
                return np.zeros(0, int), np.zeros((0, 3), np.float32), np.zeros(0, int)
            return np.asarray(out_sel), np.asarray(out_p, np.float32), np.asarray(out_tid)

        tsel_c, tP_c, ttid_c = text_3d(kf_c)
        tsel_l, tP_l, ttid_l = text_3d(kf_l)

        # combined candidate sets
        all_sel_c = np.concatenate([sel_c, tsel_c]).astype(int)
        all_P_c = np.concatenate([P_c, tP_c]).astype(np.float32) if len(all_sel_c) else P_c
        all_sel_l = np.concatenate([sel_l, tsel_l]).astype(int)
        all_P_l = np.concatenate([P_l, tP_l]).astype(np.float32) if len(all_sel_l) else P_l
        if len(all_sel_c) < 10 or len(all_sel_l) < 10:
            return None

        # descriptor match between the two sets
        from ..frontend.tracking import pad_tier, _pad

        N1 = pad_tier(len(all_sel_c))
        N2 = pad_tier(len(all_sel_l))
        v1 = np.zeros(N1, bool); v1[: len(all_sel_c)] = True
        v2 = np.zeros(N2, bool); v2[: len(all_sel_l)] = True
        idx, ok = matching.mutual_best_match(
            jnp.asarray(_pad(kf_c.kp_desc[all_sel_c], N1)),
            jnp.asarray(_pad(kf_l.kp_desc[all_sel_l], N2)),
            jnp.asarray(v1), jnp.asarray(v2),
            max_dist=self.cfg.match.th_low,
        )
        idx, ok = np.asarray(idx), np.asarray(ok)
        rows = np.nonzero(ok[: len(all_sel_c)])[0]
        rows = rows[idx[rows] < len(all_sel_l)]
        if len(rows) < 10:
            return None
        P1 = all_P_c[rows]
        P2 = all_P_l[idx[rows]]
        uv1 = kf_c.kp_uv[all_sel_c[rows]]
        uv2 = kf_l.kp_uv[all_sel_l[idx[rows]]]

        Np = pad_tier(len(rows), 64)
        S_cl, inl, n_inl = sim3_opt.sim3_ransac(
            self._next_key(),
            jnp.asarray(_pad(P1, Np)), jnp.asarray(_pad(P2, Np)),
            jnp.asarray(_pad(uv1, Np)), jnp.asarray(_pad(uv2, Np)),
            jnp.asarray(_pad(np.ones(len(rows), bool), Np, False)),
            cam.fx, cam.fy, cam.cx, cam.cy,
            err2_thresh=lcfg.sim3_inlier_err2,
        )
        if int(n_inl) < 20:
            return None
        S_ref, inl2 = sim3_opt.refine_sim3(
            S_cl,
            jnp.asarray(_pad(P1, Np)), jnp.asarray(_pad(P2, Np)),
            jnp.asarray(_pad(uv1, Np)), jnp.asarray(_pad(uv2, Np)),
            jnp.asarray(_pad(np.ones(len(rows), bool), Np, False)),
            cam.fx, cam.fy, cam.cx, cam.cy,
            err_thresh=lcfg.sim3_refine_err,
        )
        n2 = int(inl2.sum())
        if n2 < lcfg.min_inliers:
            return None
        inl_np = np.asarray(inl2)[: len(rows)]
        # outdoor sequences additionally require enough map-point-backed
        # (non-text) inliers (src/loopClosing.cc:92-106)
        from ..config import Experiment

        if self.cfg.experiment == Experiment.OUTDOOR:
            scene_inl = sum(
                1 for r, keep in zip(rows, inl_np)
                if keep and r < len(sel_c) and idx[r] < len(sel_l)
            )
            if scene_inl < lcfg.min_scene_inliers_outdoor:
                return None
        # landmark fusion pairs: both sides map-point-backed
        fuse_pts, fuse_txts = [], []
        for r, keep in zip(rows, inl_np):
            if not keep:
                continue
            li = idx[r]
            if r < len(sel_c) and li < len(sel_l):
                fuse_pts.append((int(pid_c[r]), int(pid_l[li])))
            elif r >= len(sel_c) and li >= len(sel_l):
                tc = ttid_c[r - len(sel_c)]
                tl = ttid_l[li - len(sel_l)]
                if tc != tl:
                    fuse_txts.append((int(tc), int(tl)))
        return np.asarray(S_ref), {"points": fuse_pts, "texts": fuse_txts}

    # ------------------------------------------------------------------
    def correct(self, kid: int, loop_kid: int, S_cl: np.ndarray, pairs):
        """LoopCorrect: propagate correction, fuse, pose-graph, refine."""
        m = self.map
        K = len(m.keyframes)

        # corrected Sim3 pose of current KF: S_cw = S_cl ∘ S_lw
        S_lw = np.asarray(sim3.from_se3(jnp.asarray(m.kf_pose[loop_kid])))
        S_cw_corr = np.asarray(sim3.compose(jnp.asarray(S_cl), jnp.asarray(S_lw)))

        # propagate to the covisible window of kid (Sic ∘ Scw)
        window = set(int(c) for c in m.covisible_kfs(kid)) | {kid}
        window = {w for w in window if w > loop_kid}  # don't drag the old side
        T_cw = jnp.asarray(m.kf_pose[kid])
        corrected = {}
        for w in window:
            S_ic = sim3.from_se3(se3.relative(jnp.asarray(m.kf_pose[w]), T_cw))
            corrected[w] = np.asarray(sim3.compose(S_ic, jnp.asarray(S_cw_corr)))

        # landmark fusion (keep the loop-side landmark — it is in the trusted
        # frame; mapPts::Replace semantics)
        for (pc, pl) in pairs["points"]:
            if pc != pl and m.pt_valid[pc] and m.pt_valid[pl]:
                m.replace_point(pc, pl)
        for (tc, tl) in pairs["texts"]:
            if m.tx_valid[tc] and m.tx_valid[tl]:
                m.replace_text(tc, tl)
        m.rebuild_covis_m1()
        m.rebuild_covis_m23()

        # ---------------- pose graph ----------------
        nodes = np.zeros((K, 8), np.float32)
        for k in range(K):
            if k in corrected:
                nodes[k] = corrected[k]
            else:
                nodes[k] = np.asarray(sim3.from_se3(jnp.asarray(m.kf_pose[k])))
        fixed = np.zeros(K, bool)
        fixed[0] = True
        if K > 1:
            fixed[1] = True
        fixed[loop_kid] = True

        edge_a, edge_b, meas, weight = [], [], [], []
        # sequential + covisibility edges with pre-correction measurements
        pre = np.stack([np.asarray(sim3.from_se3(jnp.asarray(m.kf_pose[k]))) for k in range(K)])
        for b in range(1, K):
            a = b - 1
            edge_a.append(a); edge_b.append(b)
            meas.append(np.asarray(sim3.compose(jnp.asarray(pre[b]), sim3.inverse(jnp.asarray(pre[a])))))
            weight.append(1.0)
        Kc = min(K, self.cfg.map.max_keyframes)
        covis = m.M1[:Kc, :Kc] + 5 * m.M2[:Kc, :Kc]
        for a in range(K):
            for b in range(a + 2, K):
                if covis[a, b] >= 30:
                    edge_a.append(a); edge_b.append(b)
                    meas.append(np.asarray(sim3.compose(jnp.asarray(pre[b]), sim3.inverse(jnp.asarray(pre[a])))))
                    weight.append(1.0)
        # loop edge with the measured Sim3
        edge_a.append(loop_kid); edge_b.append(kid)
        meas.append(S_cl.astype(np.float32))
        weight.append(float(len(edge_a)))  # strong anchor

        E = len(edge_a)
        graph = sim3_opt.PoseGraph(
            nodes=jnp.asarray(nodes),
            fixed=jnp.asarray(fixed),
            edge_a=jnp.asarray(edge_a, dtype=jnp.int32),
            edge_b=jnp.asarray(edge_b, dtype=jnp.int32),
            edge_meas=jnp.asarray(np.stack(meas)),
            edge_valid=jnp.ones(E, dtype=bool),
            edge_weight=jnp.asarray(weight, dtype=jnp.float32),
        )
        out, cost = sim3_opt.solve_pose_graph(graph, n_iters=self.cfg.solver.iters_pose_graph)
        out = np.asarray(out)

        # write back: T = [R, t/s]; landmark rho,theta scale by host s
        # (src/optimizer.cc:906-955)
        scales = out[:, 7].copy()
        for k in range(K):
            q = out[k, :4]
            t = out[k, 4:7] / max(scales[k], 1e-9)
            m.kf_pose[k] = np.concatenate([q, t]).astype(np.float32)
        for pid in range(m.n_points):
            if m.pt_valid[pid]:
                h = int(m.pt_host[pid])
                if h < K:
                    m.pt_rho[pid] = m.pt_rho[pid] * scales[h]
        for tid in range(m.n_texts):
            if m.tx_valid[tid]:
                h = int(m.tx_host[tid])
                if h < K:
                    m.tx_theta[tid] = m.tx_theta[tid] * scales[h]

        # SearchAndFuse (src/loopClosing.cc:1045-1385): project loop-side
        # landmarks into the corrected window KFs, descriptor-match, fuse
        self._search_and_fuse(kid, loop_kid, window)

        # ---------------- global refinement ----------------
        if self.tracker is not None:
            all_kids = list(range(K))
            # scene-only global BA (reference GlobalBA has FLAG_TEXT=false)
            self.tracker._local_ba(window_kids=all_kids, fix=[0, 1][: min(2, K)],
                                   scene_only=True)
            # landmark-only refinement (OptimizeLandmarker)
            self.tracker._local_ba(window_kids=all_kids, fix=all_kids)
        m.rebuild_covis_m1()
        m.rebuild_covis_m23()

    def _search_and_fuse(self, kid: int, loop_kid: int, window):
        """Project loop-side map points into each window KF under the
        corrected poses; where a projected loop point matches a keypoint
        already bound to a (younger) duplicate point, fuse them
        (SearchAndFuse, src/loopClosing.cc:1045-1385)."""
        from ..frontend.tracking import search_from_3d, pad_tier, _pad, _pad_pose

        m = self.map
        cam = self.cfg.camera
        # loop-side = points hosted at or before the loop KF
        lp = np.nonzero(m.pt_valid[: m.n_points] & ~m.pt_bad[: m.n_points]
                        & (m.pt_host[: m.n_points] <= loop_kid))[0]
        if len(lp) == 0:
            return
        P = pad_tier(len(lp))
        fused = 0
        for w in sorted(window):
            kf = m.keyframes[w]
            host = m.pt_host[lp].clip(0)
            valid = np.zeros(P, bool)
            valid[: len(lp)] = True
            idx, ok, proj, z = search_from_3d(
                jnp.asarray(_pad(m.pt_ray[lp], P)),
                jnp.asarray(_pad(m.pt_rho[lp], P)),
                jnp.asarray(_pad_pose(m.kf_pose[host], P)),
                jnp.asarray(_pad(m.pt_desc[lp], P)),
                jnp.asarray(valid),
                jnp.asarray(m.kf_pose[w]),
                jnp.asarray(kf.kp_uv), jnp.asarray(kf.kp_desc), jnp.asarray(kf.kp_valid),
                cam.fx, cam.fy, cam.cx, cam.cy,
                5.0, self.cfg.match.th_low, cam.width, cam.height,
            )
            idx, ok = np.asarray(idx), np.asarray(ok)
            for r in np.nonzero(ok[: len(lp)])[0]:
                pid_loop = int(lp[r])
                kp = int(idx[r])
                pid_cur = int(kf.kp_point[kp])
                if pid_cur < 0:
                    m.add_observation(w, kp, pid_loop)
                elif pid_cur != pid_loop and m.pt_host[pid_cur] > loop_kid:
                    m.replace_point(pid_cur, pid_loop)
                    fused += 1
            if fused > 200:
                break
