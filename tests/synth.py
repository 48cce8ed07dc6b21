"""Synthetic rendered sequences with exact ground truth.

World = textured planes; each frame is rendered by exact homography warps of
the plane textures (cv2 on host, test-only), so ORB features are genuinely
matchable across frames and ATE can be checked against analytic poses.
Also used by bench.py.
"""

from __future__ import annotations

import numpy as np
import cv2
import jax.numpy as jnp

from textslam_tpu.geometry.quaternion import qexp, qto_matrix
from textslam_tpu.geometry import se3

FX, FY, CX, CY = 420.0, 420.0, 320.0, 240.0
W, H = 640, 480
K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])


def make_texture(rng, size=1024, blobs=4000):
    """High-frequency matte texture with corners at many scales."""
    tex = np.full((size, size), 128.0, np.float32)
    xs = rng.integers(6, size - 6, blobs)
    ys = rng.integers(6, size - 6, blobs)
    for x, y in zip(xs, ys):
        w = int(rng.integers(3, 14))
        h = int(rng.integers(3, 14))
        val = float(rng.uniform(0, 255))
        tex[y : y + h, x : x + w] = val
    return cv2.GaussianBlur(tex, (3, 3), 0.8)


class PlaneWorld:
    """A set of textured planes z = const in world coordinates."""

    def __init__(self, seed=0, planes=None):
        rng = np.random.default_rng(seed)
        if planes is None:
            # (depth, px/m, mask region or None) — depth diversity conditions
            # the rotation/translation ambiguity of shallow scenes
            planes = [
                (7.0, 12.0, None),
                (4.0, 8.0, (260, 760, 200, 640)),
                (2.8, 6.0, (120, 420, 560, 980)),
                (5.0, 9.0, (600, 950, 80, 560)),
            ]
        self.planes = []  # (Z0, scale px/m, texture, mask, (x_off, y_off))
        for i, spec in enumerate(planes):
            # optional 4th element: world-frame (x, y) offset of the texture
            # center — lets worlds tile wall segments along a path so that
            # segments genuinely leave the frustum (loop-closure fixtures)
            z0, scale, region = spec[:3]
            off = np.asarray(spec[3], np.float64) if len(spec) > 3 else np.zeros(2)
            tex = make_texture(rng)
            if region is None:
                mask = np.ones_like(tex)
            else:
                mask = np.zeros_like(tex)
                y0, y1, x0, x1 = region
                mask[y0:y1, x0:x1] = 1.0
            self.planes.append((z0, scale * 40.0, tex, mask, off))

    def render(self, pose_cw: np.ndarray, K_mat=None, size=None) -> np.ndarray:
        """Render the world for camera pose Tcw [7] (wxyz + t).

        K_mat/size override the intrinsics/canvas — used to render an
        extended field of view (e.g. to synthesize full-coverage distorted
        images for the CLI undistortion fixture)."""
        Km = K if K_mat is None else K_mat
        Wc, Hc = (W, H) if size is None else size
        q, t = pose_cw[:4], pose_cw[4:]
        R = np.array(qto_matrix(jnp.asarray(q)))
        img = np.zeros((Hc, Wc), np.float32)
        alpha = np.zeros((Hc, Wc), np.float32)
        # paint far-to-near so nearer planes occlude correctly
        for z0, s, tex, mask, off in sorted(self.planes, key=lambda p: -p[0]):
            th, tw = tex.shape
            r1, r2, r3 = R[:, 0], R[:, 1], R[:, 2]
            col3 = (r3 * z0 + t + r1 * (off[0] - tw / (2 * s))
                    + r2 * (off[1] - th / (2 * s)))
            Hm = Km @ np.stack([r1 / s, r2 / s, col3], axis=1)
            warped = cv2.warpPerspective(tex, Hm, (Wc, Hc), flags=cv2.INTER_LINEAR)
            wmask = cv2.warpPerspective(mask, Hm, (Wc, Hc), flags=cv2.INTER_NEAREST)
            img = np.where(wmask > 0, warped, img)
            alpha = np.maximum(alpha, wmask)
        return img


TEXT_STRINGS = ["CAFE", "EXIT", "HOTEL", "MARKET", "LIBRARY", "STATION"]


def plane_theta_in_cam(z0: float, pose_cw: np.ndarray) -> np.ndarray:
    """Ground-truth theta of the world plane z = z0 expressed in a camera.

    Plane covector in world: (0, 0, 1, -z0) (n.p - z0 = 0). In camera coords
    p_w = T_wc p_c, so pi_c = T_wc^T pi_w; theta = n_c / d_c with our
    convention theta^T p + 1 = 0."""
    q, t = pose_cw[:4], pose_cw[4:]
    R = np.array(qto_matrix(jnp.asarray(q)))  # p_c = R p_w + t
    # T_wc: p_w = R^T (p_c - t)
    Rwc = R.T
    twc = -R.T @ t
    n_w = np.array([0.0, 0.0, 1.0])
    n_c = Rwc.T @ n_w  # rotation part of T_wc^T
    d_c = n_w @ twc - z0
    return (n_c / d_c).astype(np.float32)


class TextWorld(PlaneWorld):
    """PlaneWorld + rectangular text regions on the planes with strings."""

    def __init__(self, seed=0, planes=None, boxes_per_plane=2,
                 box_px=((140, 220), (70, 110))):
        super().__init__(seed=seed, planes=planes)
        rng = np.random.default_rng(seed + 100)
        self.boxes = []  # (plane_idx, tex rect corners [4,2], string)
        si = 0
        for pi, (z0, s, tex, mask, off) in enumerate(self.planes):
            ys, xs = np.nonzero(mask)
            if len(ys) == 0:
                continue
            y0, y1, x0, x1 = ys.min(), ys.max(), xs.min(), xs.max()
            for b in range(boxes_per_plane):
                bw = int(rng.uniform(*box_px[0]))
                bh = int(rng.uniform(*box_px[1]))
                if x1 - x0 < bw + 40 or y1 - y0 < bh + 40:
                    continue
                bx = int(rng.uniform(x0 + 20, x1 - bw - 20))
                by = int(rng.uniform(y0 + 20, y1 - bh - 20))
                quad_tex = np.array(
                    [[bx, by], [bx + bw, by], [bx + bw, by + bh], [bx, by + bh]],
                    np.float32,
                )
                base = TEXT_STRINGS[si % len(TEXT_STRINGS)]
                # unique strings so tests can map box -> GT plane 1:1
                self.boxes.append((pi, quad_tex, f"{base}{si}"))
                si += 1

    def detections(self, pose_cw: np.ndarray, margin=8.0):
        """Project text boxes into a camera -> list of TextDetection."""
        from textslam_tpu.frontend.frame import TextDetection

        q, t = pose_cw[:4], pose_cw[4:]
        R = np.array(qto_matrix(jnp.asarray(q)))
        dets = []
        for pi, quad_tex, string in self.boxes:
            z0, s, tex, mask, off = self.planes[pi]
            th, tw = tex.shape
            X = (quad_tex[:, 0] - tw / 2) / s + off[0]
            Y = (quad_tex[:, 1] - th / 2) / s + off[1]
            P_w = np.stack([X, Y, np.full(4, z0)], -1)
            pc = P_w @ R.T + t
            if (pc[:, 2] <= 0.1).any():
                continue
            uv = np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1)
            if not ((uv[:, 0] > margin) & (uv[:, 0] < W - margin)
                    & (uv[:, 1] > margin) & (uv[:, 1] < H - margin)).all():
                continue
            dets.append(TextDetection(quad=uv.astype(np.float32), text=string, score=0.9))
        return dets


RING_SEGMENTS = 12          # wall segments around the circuit
RING_SPACING = 1.0          # metres between segment centers along the ring
RING_RADIUS = RING_SEGMENTS * RING_SPACING / (2 * np.pi)
RING_LAPS = 1.15            # loop-closure fixtures revisit the first ~15%


def degrade_frame(img, rng, g, darken=0.70, noise=13.0, blur=1.7):
    """Photometric degradation at strength g in [0, 1].

    Models an underexposed, motion-blurred stretch (a tunnel run): darkening,
    Gaussian blur, and sensor noise all scale with g. Used by the
    engineered-drift loop fixtures — degraded wall handoffs carry fewer,
    noisier correspondences, so the monocular pose/scale estimate genuinely
    drifts (the reference's loop closure exists to repair exactly this,
    src/loopClosing.cc:119-304)."""
    if g <= 0:
        return img
    out = img * (1.0 - darken * g)
    s = float(blur * g)
    if s > 0.05:
        k = int(2 * round(2 * s) + 1)
        out = cv2.GaussianBlur(out, (k, k), s)
    out = out + rng.normal(0.0, noise * g, out.shape)
    return np.clip(out, 0, 255).astype(np.float32)


def degrade_schedule(n_frames, f0=0.21, f1=0.74, ramp=0.05):
    """Per-frame degradation strength: 0 outside [f0, f1] (fractions of the
    sequence), cosine-ramped over `ramp` at both edges so tracking never sees
    a discontinuity."""
    s = np.linspace(0.0, 1.0, n_frames)
    up = np.clip((s - f0) / ramp, 0.0, 1.0)
    down = np.clip((f1 - s) / ramp, 0.0, 1.0)
    return (0.5 - 0.5 * np.cos(np.pi * np.minimum(up, down))).astype(np.float32)


def ring_world(seed=0, n_segments=RING_SEGMENTS, boxes_per_plane=3,
               box_px=((140, 220), (70, 110))):
    """A circuit of wall segments tiled around a ring in the x-y plane.

    Unlike the default 4-plane world (whose planes never leave the frustum,
    so every KF pair stays covisible and the loop gate — correctly — rejects
    every candidate), each ring segment is only visible from a ~±2 m arc of
    the path: by mid-lap the starting walls are physically out of view, the
    covisible graph breaks, and a revisit on lap 2 must re-triangulate
    duplicate points/texts — the exact precondition for semantic loop
    closure (src/loopClosing.cc:119-304) at scale."""
    R = n_segments * RING_SPACING / (2 * np.pi)
    planes = []
    for i in range(n_segments):
        phi = 2 * np.pi * i / n_segments
        x, y = R * np.sin(phi), R * (1 - np.cos(phi))
        depth = 1.8 if i % 2 == 0 else 2.6
        # scale 12.5 -> 500 px/m: each 1024-px texture spans 2.05 m, so
        # same-depth segments (2 m apart) barely overlap
        planes.append((depth, 12.5, None, (x, y)))
    return TextWorld(seed=seed, planes=planes, boxes_per_plane=boxes_per_plane,
                     box_px=box_px)


def camera_path(n_frames: int, kind="lateral"):
    """Ground-truth Tcw poses [N, 7]."""
    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        if kind == "lateral":
            t_wc = np.array([1.2 * s, 0.15 * np.sin(2 * np.pi * s), 0.3 * s])
            w = np.array([0.0, -0.25 * s, 0.02 * np.sin(2 * np.pi * s)])
        elif kind == "forward":
            t_wc = np.array([0.2 * s, 0.0, 1.5 * s])
            w = np.array([0.0, 0.05 * s, 0.0])
        elif kind == "outback":
            # out along +x then back to the start (loop-closure fixture)
            u = 2 * s if s <= 0.5 else 2 * (1 - s)
            t_wc = np.array([1.0 * u, 0.05 * np.sin(np.pi * u), 0.15 * u])
            w = np.array([0.0, -0.2 * u, 0.0])
        elif kind == "outback2":
            # two out-and-back excursions (multi-loop fixture)
            v = 2 * s % 1.0 if s < 1.0 else 1.0
            u = 2 * v if v <= 0.5 else 2 * (1 - v)
            t_wc = np.array([1.0 * u, 0.05 * np.sin(np.pi * u), 0.15 * u])
            w = np.array([0.0, -0.2 * u, 0.0])
        elif kind == "ring":
            # one-and-a-bit laps around the ring_world circuit, translation
            # only (walls are fronto-parallel, so the camera keeps identity
            # orientation and tracks by pure lateral parallax)
            phi = 2 * np.pi * RING_LAPS * s
            t_wc = np.array([RING_RADIUS * np.sin(phi),
                             RING_RADIUS * (1 - np.cos(phi)), 0.0])
            w = np.zeros(3)
        else:
            raise ValueError(kind)
        q = np.array(qexp(jnp.asarray(w)))
        # Tcw = inverse of Twc(q, t_wc)
        Twc = np.concatenate([q, t_wc]).astype(np.float32)
        poses.append(np.array(se3.inverse(jnp.asarray(Twc))))
    return np.stack(poses)


def render_sequence(n_frames=40, seed=0, kind="lateral"):
    world = PlaneWorld(seed=seed)
    poses = camera_path(n_frames, kind)
    frames = [world.render(p) for p in poses]
    return frames, poses


def render_text_sequence(n_frames=40, seed=0, kind="lateral"):
    world = TextWorld(seed=seed)
    poses = camera_path(n_frames, kind)
    frames = [world.render(p) for p in poses]
    dets = [world.detections(p) for p in poses]
    return frames, dets, poses, world


def ate_rmse(est_ts, est_poses_cw, gt_poses_cw, gt_stride=1):
    """Sim3-aligned ATE RMSE of camera centers (evo_ape -s protocol)."""
    from textslam_tpu.geometry import sim3

    est_C = np.array(se3.apply(se3.inverse(jnp.asarray(est_poses_cw)), jnp.zeros((len(est_poses_cw), 3))))
    gt_idx = [int(round(t)) for t in est_ts]
    gt_C = np.array(se3.apply(se3.inverse(jnp.asarray(gt_poses_cw[gt_idx])), jnp.zeros((len(gt_idx), 3))))
    S = sim3.horn_alignment(jnp.asarray(gt_C), jnp.asarray(est_C))
    aligned = np.array(sim3.apply(S, jnp.asarray(est_C)))
    err = np.linalg.norm(aligned - gt_C, axis=-1)
    return float(np.sqrt((err**2).mean()))
