"""Engineered-drift ring fixture preconditions, pinned cheaply.

The on-chip loop-at-scale demonstration (`bench_scale.py N --kind=ring_drift`)
needs three things to hold by construction: (1) the degraded stretch is
severe enough that wall handoffs genuinely lose quality (drift accumulates),
(2) yet never blinds tracking (the reference exits on lost, src/tracking.cc;
we demote to LOST — either way the run would be over), and (3) the seam arc
is clean on BOTH eras with text detections live, so the revisit can vote.
These tests pin the fixture, not the pipeline — the full run's numbers live
in BASELINE.md round 5.
"""

import numpy as np
import jax.numpy as jnp

import synth
from textslam_tpu.ops import fast


def _corner_count(img: np.ndarray, threshold: float = 7.0) -> int:
    # threshold 7 = the pipeline's fast_threshold_min (config.py), i.e. what
    # the extractor actually runs at
    smap = fast.nms3(fast.fast_score_map(
        jnp.asarray(img, jnp.float32), jnp.asarray(threshold, jnp.float32)))
    return int((np.asarray(smap) > 0).sum())


class TestDriftSchedule:
    def test_ramps_and_support(self):
        g = synth.degrade_schedule(250)
        assert g.min() == 0.0 and g.max() == 1.0
        # no discontinuity: per-frame strength step stays under 0.15
        assert np.abs(np.diff(g)).max() < 0.15
        # clean head and tail (the seam arc on both eras)
        assert (g[: int(0.20 * 250)] == 0).all()
        assert (g[int(0.75 * 250):] == 0).all()

    def test_degraded_frames_stay_trackable(self):
        """At full strength the walls must still yield enough FAST corners
        to keep n_matches comfortably above the LOST threshold (10), while
        losing a large fraction of the clean count — degraded, not blind."""
        world = synth.ring_world(seed=3, box_px=((80, 130), (50, 80)))
        poses = synth.camera_path(250, "ring")
        rng = np.random.default_rng(9)
        i = 110  # mid-stretch (g == 1 under the default schedule)
        clean = world.render(poses[i])
        # signal corners: darken+blur only — the sensor noise adds SPURIOUS
        # corners on top (score ~ sigma, comparable to the darkened real
        # ones), which degrade matching further but would corrupt a raw
        # count-based severity check
        signal = synth.degrade_frame(clean, rng, 1.0, noise=0.0)
        n_clean = _corner_count(clean)
        n_signal = _corner_count(signal)
        assert n_clean > 800, n_clean
        assert n_signal > 120, f"blind at full degradation: {n_signal}"
        assert n_signal < 0.5 * n_clean, (
            f"degradation too mild: {n_signal}/{n_clean} signal corners")

    def test_seam_arc_has_detections_both_eras(self):
        world = synth.ring_world(seed=3, box_px=((80, 130), (50, 80)))
        poses = synth.camera_path(250, "ring")
        g = synth.degrade_schedule(250)
        first = {d.text for i in range(0, 20) if g[i] == 0
                 for d in world.detections(poses[i])}
        revisit = {d.text for i in range(230, 250) if g[i] == 0
                   for d in world.detections(poses[i])}
        assert len(first & revisit) >= 3, (first, revisit)
