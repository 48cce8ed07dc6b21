"""The ring-circuit fixture's loop-closure precondition, pinned cheaply.

Semantic loop closure (src/loopClosing.cc:119-304) can only fire when the
revisited keyframe shares NO observations with the candidate's era — the
reference's own covisibility exclusion (M1/M2/M3 == 0) rejects everything
else. The default 4-plane world keeps every plane in view forever, so that
precondition never holds (BASELINE.md round-5 caveat a). `synth.ring_world`
exists to make it hold by construction: wall segments tile a circuit and
physically leave the frustum mid-lap. These tests pin that geometry without
running the pipeline; the full on-chip run is `bench_scale.py N --kind=ring`
(numbers in BASELINE.md round 5).
"""

import numpy as np

import synth


def _visible_strings(world, pose):
    return {d.text for d in world.detections(pose)}


class TestRingWorldGeometry:
    def setup_method(self):
        self.world = synth.ring_world(seed=3)
        self.poses = synth.camera_path(400, "ring")

    def test_start_walls_leave_view_mid_lap(self):
        """By mid-lap the lap-start segments are fully out of the frustum:
        no text box visible at the start remains visible anywhere in the
        middle half-lap — the covisible chain to lap-start KFs must break."""
        start = _visible_strings(self.world, self.poses[0])
        assert len(start) >= 6, f"start view too sparse: {start}"
        mid = set()
        for i in range(140, 210):
            mid |= _visible_strings(self.world, self.poses[i])
        assert start.isdisjoint(mid), f"still covisible mid-lap: {start & mid}"

    def test_revisit_sees_start_walls_again(self):
        """Lap 2 re-enters the lap-start arc: the final frames see the same
        text strings as frame 0 (the duplicate-map / SearchAndFuse setup)."""
        start = _visible_strings(self.world, self.poses[0])
        revisit = _visible_strings(self.world, self.poses[-1])
        # the 1.15-lap path ends ~0.9 rad past the seam: expect substantial
        # (not necessarily exact) overlap with the frame-0 view
        assert len(start & revisit) >= 4, (start, revisit)

    def test_every_frame_has_texture_and_text(self):
        """Tracking viability: the circuit leaves no blind frames — every
        pose sees mostly-textured walls and at least one readable box."""
        for i in range(0, 400, 10):
            img = self.world.render(self.poses[i])
            assert (img > 0).mean() > 0.5, f"frame {i} mostly empty"
            assert self.world.detections(self.poses[i]), f"frame {i}: no text"

    def test_no_world_point_spans_both_eras(self):
        """No wall point is visible from both frame 0 and mid-lap: shared
        map points between the two eras are impossible, so M1 between a
        lap-start KF and a mid-lap KF is structurally zero. (Whole planes
        CAN be corner-visible from both sides of the ring — but through
        disjoint patches, which is why this checks points, not planes.)"""
        def visible_mask(points_w, pose):
            q, t = pose[:4], pose[4:]
            from textslam_tpu.geometry.quaternion import qto_matrix
            import jax.numpy as jnp
            R = np.array(qto_matrix(jnp.asarray(q)))
            pc = points_w @ R.T + t
            ok = pc[:, 2] > 0.1
            u = synth.FX * pc[:, 0] / np.maximum(pc[:, 2], 0.1) + synth.CX
            v = synth.FY * pc[:, 1] / np.maximum(pc[:, 2], 0.1) + synth.CY
            return ok & (u >= 0) & (u < synth.W) & (v >= 0) & (v < synth.H)

        # dense grid over every wall segment's world rectangle
        pts = []
        for z0, s, tex, mask, off in self.world.planes:
            half = tex.shape[0] / (2 * s)
            xs = np.linspace(-half, half, 40) + off[0]
            ys = np.linspace(-half, half, 40) + off[1]
            gx, gy = np.meshgrid(xs, ys)
            pts.append(np.stack([gx.ravel(), gy.ravel(),
                                 np.full(gx.size, z0)], -1))
        pts = np.concatenate(pts)

        start_vis = visible_mask(pts, self.poses[0])
        for i in range(140, 210, 10):
            both = start_vis & visible_mask(pts, self.poses[i])
            assert not both.any(), (
                f"{both.sum()} wall points visible at both frame 0 and {i}")
