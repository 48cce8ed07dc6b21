"""CLI dress rehearsal (VERDICT r2 next #1): render a synthetic sequence to
disk in the reference's EXACT dataset layout and drive `main.py` on it for
all 4 experiment configs — the binary path the driver will eventually score.

Layout contract exercised (main.cpp:30-98, src/tool.cc:21-215,
src/setting.cc:20-95):
- yaml config: `Exp name/noText/read path/read list`, `Camera.*`; the list
  file is `[read path]+[read list]+".txt"`
- `Imlist.txt`-style list: lines "timestamp images/<name>.png"
- per-frame text files at the IMAGE-STEM path with "images"->"text":
  `text/<stem>_dete.txt` (8 comma-separated corner coords per line) and
  `text/<stem>_mean.txt` ("string,score" lines, incl. CJK and "#" entries)
- images stored DISTORTED; the pipeline undistorts with Camera.k1..k3/p1/p2
"""

import os
import sys

import numpy as np
import cv2
import pytest

import synth

DIST = np.array([-0.05, 0.01, 0.0, 0.0, 0.0])  # k1,k2,p1,p2,k3

# undistorted pinhole coords of every distorted pixel (homogeneous), once
_qx, _qy = np.meshgrid(np.arange(synth.W, dtype=np.float32),
                       np.arange(synth.H, dtype=np.float32))
_pts = np.stack([_qx.ravel(), _qy.ravel()], -1).reshape(-1, 1, 2)
_UND = cv2.undistortPoints(_pts, synth.K, DIST, P=synth.K).reshape(
    synth.H, synth.W, 2).astype(np.float64)
_UND_H = np.concatenate([_UND, np.ones((synth.H, synth.W, 1))], -1)


def render_distorted(world, pose_cw) -> np.ndarray:
    """Synthesize the DISTORTED camera image in ONE resample per plane:
    for each distorted pixel q, sample the plane texture at
    H^-1 · undistort_point(q). A real camera applies exactly one optical
    blur to the distorted image; composing an ideal render with a second
    distortion warp would double-blur the texture and measurably degrade
    the direct photometric alignment (the attribution A/B that motivated
    this is in PROGRESS.md round 3). Full sensor coverage falls out (no
    static black border wedges to mint fake stationary corners)."""
    from textslam_tpu.geometry.quaternion import qto_matrix
    import jax.numpy as jnp

    q, t = pose_cw[:4], pose_cw[4:]
    R = np.array(qto_matrix(jnp.asarray(q)))
    img = np.zeros((synth.H, synth.W), np.float32)
    for z0, s, tex, mask, off in sorted(world.planes, key=lambda p: -p[0]):
        th, tw = tex.shape
        r1, r2, r3 = R[:, 0], R[:, 1], R[:, 2]
        col3 = (r3 * z0 + t + r1 * (off[0] - tw / (2 * s))
                + r2 * (off[1] - th / (2 * s)))
        Hm = synth.K @ np.stack([r1 / s, r2 / s, col3], axis=1)
        tc = _UND_H @ np.linalg.inv(Hm).T  # [H, W, 3] texture homogeneous
        # plain projective divide — identical to warpPerspective's WARP_INVERSE
        # semantics (the fixture's planes never cross the camera plane)
        tcx = (tc[..., 0] / tc[..., 2]).astype(np.float32)
        tcy = (tc[..., 1] / tc[..., 2]).astype(np.float32)
        warped = cv2.remap(tex, tcx, tcy, cv2.INTER_LINEAR)
        wmask = cv2.remap(mask, tcx, tcy, cv2.INTER_NEAREST)
        img = np.where(wmask > 0, warped, img)
    return img


def write_yaml(path, exp_name, read_path, read_list, fps=10.0, no_text=0):
    with open(path, "w") as f:
        f.write("%YAML:1.0\n")
        f.write(f"Exp name: {exp_name}\n")
        f.write(f"Exp noText: {no_text}\n")
        f.write(f'Exp read path: "{read_path}/"\n')
        f.write(f'Exp read list: "{read_list}"\n')
        f.write(f"Camera.fx: {synth.FX}\nCamera.fy: {synth.FY}\n")
        f.write(f"Camera.cx: {synth.CX}\nCamera.cy: {synth.CY}\n")
        f.write(f"Camera.k1: {DIST[0]}\nCamera.k2: {DIST[1]}\n")
        f.write(f"Camera.p1: {DIST[2]}\nCamera.p2: {DIST[3]}\n")
        f.write(f"Camera.k3: {DIST[4]}\n")
        f.write(f"Camera.width: {synth.W}\nCamera.height: {synth.H}\n")
        f.write(f"Camera.fps: {fps}\nCamera.RGB: 0\n")


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    """Reference-layout dataset on disk + GT poses."""
    root = tmp_path_factory.mktemp("textslam_seq")
    n_frames = 20
    frames, dets, gt_poses, world = synth.render_text_sequence(
        n_frames=n_frames, seed=1, kind="lateral")
    os.makedirs(root / "images")
    os.makedirs(root / "text")
    lines, short_lines = [], []
    for i in range(n_frames):
        name = f"images/{i:04d}.png"
        img_d = render_distorted(world, gt_poses[i])
        cv2.imwrite(str(root / name), img_d.clip(0, 255).astype(np.uint8))
        # text files keyed by the image stem (src/tool.cc:45-46, main.cpp:60)
        stem = f"{i:04d}"
        with open(root / "text" / f"{stem}_dete.txt", "w") as fd, \
             open(root / "text" / f"{stem}_mean.txt", "w", encoding="utf-8") as fm:
            for d in dets[i]:
                fd.write(",".join(f"{v:.2f}" for v in d.quad.ravel()) + "\n")
                fm.write(f"{d.text},{d.score:.2f}\n")
            if i == 5:
                # exercise the parser's CJK + empty-OCR ("#") handling on
                # one frame only (a detection STATIC in image coordinates
                # across frames is a physically impossible input that seeds
                # junk landmarks)
                fd.write("1,1,9,1,9,9,1,9\n")
                fm.write("你好餐厅,0.50\n")
                fd.write("11,1,19,1,19,9,11,9\n")
                fm.write("#,0.10\n")
        t = i / 10.0
        lines.append(f"{t:.6f} {name}\n")
        if i < 12:
            short_lines.append(f"{t:.6f} {name}\n")
    with open(root / "Imlist.txt", "w") as f:
        f.writelines(lines)
    with open(root / "Imshort.txt", "w") as f:
        f.writelines(short_lines)
    # one yaml per experiment; exps 1-3 use the shorter list (they exercise
    # the same binary path with per-experiment loop gates)
    for exp, lst in ((0, "Imlist"), (1, "Imshort"), (2, "Imshort"), (3, "Imshort")):
        write_yaml(root / f"exp{exp}.yaml", exp, str(root), lst)
    return root, gt_poses


def run_main(yaml_path, out_dir, *extra_args):
    import main as main_mod

    argv0 = sys.argv
    sys.argv = ["main.py", str(yaml_path), str(out_dir)] + list(extra_args)
    try:
        rc = main_mod.main()
    finally:
        sys.argv = argv0
    assert rc == 0


class TestCLIDressRehearsal:
    def test_general_motion_full(self, disk_dataset, tmp_path):
        """Full CLI run on exp 0: undistortion remap, yaml load, per-frame
        detections, all three TUM outputs, ATE vs render GT."""
        root, gt_poses = disk_dataset
        out = tmp_path / "out0"
        run_main(root / "exp0.yaml", out)
        from textslam_tpu.io import trajectory

        for fname in ("keyframe.txt", "keyframe_latest.txt", "pose_F.txt"):
            assert (out / fname).exists(), f"{fname} not written"
        ts, poses_wc = trajectory.read_tum(str(out / "keyframe.txt"))
        assert len(ts) >= 3, f"only {len(ts)} keyframes"
        # read_tum returns Twc; ate_rmse wants Tcw
        import jax.numpy as jnp
        from textslam_tpu.geometry import se3

        poses_cw = np.asarray(se3.inverse(jnp.asarray(poses_wc)))
        # timestamps are i/10 -> frame ids
        ate = synth.ate_rmse([t * 10.0 for t in ts], poses_cw, gt_poses)
        assert ate < 0.05, f"CLI ATE {ate:.4f} vs render GT"
        # keyframe_latest (rewritten after every KF) must agree with the
        # final trajectory on its last pose count
        ts_l, _ = trajectory.read_tum(str(out / "keyframe_latest.txt"))
        assert len(ts_l) == len(ts)
        # pose_F has one line per tracked frame
        ts_f, _ = trajectory.read_tum(str(out / "pose_F.txt"))
        assert len(ts_f) >= len(ts)

    @pytest.mark.parametrize("exp", [1, 2, 3])
    def test_other_experiments_run(self, disk_dataset, tmp_path, exp):
        """Exps 1-3 (indoor loops / outdoor gates) drive the same binary
        path end to end and produce a sane trajectory."""
        root, gt_poses = disk_dataset
        out = tmp_path / f"out{exp}"
        run_main(root / f"exp{exp}.yaml", out)
        from textslam_tpu.io import trajectory

        ts, poses_wc = trajectory.read_tum(str(out / "keyframe.txt"))
        assert len(ts) >= 2, f"exp {exp}: only {len(ts)} keyframes"

    def test_dataset_reader_contract(self, disk_dataset):
        """The reader reproduces the reference's path/parse contract."""
        from textslam_tpu.config import load_yaml
        from textslam_tpu.io.dataset import Dataset

        root, _ = disk_dataset
        cfg = load_yaml(str(root / "exp0.yaml"))
        assert cfg.read_list == "Imlist.txt"  # ".txt" appended by the loader
        assert abs(cfg.camera.k1 - DIST[0]) < 1e-9
        ds = Dataset(cfg)
        assert len(ds) == 20
        img, ts, dets = ds[5]
        assert img.shape == (synth.H, synth.W)
        # detections keyed by image stem: frame 5 carries its own boxes plus
        # the CJK and "#" probe lines
        strings = [d.text for d in dets]
        assert "你好餐厅" in strings
        assert "#" in strings
        cjk = dets[strings.index("你好餐厅")]
        assert cjk.lang == 1  # pure-CJK language id (src/tool.cc:163-172)
        # undistortion recovered the pinhole render (central region; the
        # borders lose coverage to the distortion warp + uint8 quantization)
        world = synth.TextWorld(seed=1)
        ideal = world.render(synth.camera_path(20, "lateral")[5])
        c = (slice(120, 360), slice(160, 480))
        err = np.abs(img[c] - ideal[c]).mean()
        assert err < 6.0, f"undistortion mean abs error {err:.2f} gray"


class TestCLICheckpointResume:
    """--checkpoint-every / --resume dress rehearsal (VERDICT r3 next #10):
    a run killed mid-sequence and resumed from its checkpoint must match the
    uninterrupted run."""

    def test_resume_matches_uninterrupted(self, disk_dataset, tmp_path):
        root, gt_poses = disk_dataset
        # noText: the scene path is deterministic after resume (the text
        # path's KLT accumulator is deliberately not serialized, so text-on
        # resumes are correct-but-not-bitwise; covered by the smoke test)
        write_yaml(root / "nt_full.yaml", 0, str(root), "Imlist", no_text=1)
        write_yaml(root / "nt_short.yaml", 0, str(root), "Imshort", no_text=1)
        from textslam_tpu.io import trajectory

        out_a = tmp_path / "uninterrupted"
        run_main(root / "nt_full.yaml", out_a)
        # "interrupted": the 12-frame prefix run checkpoints at frame 11,
        # then the full-list run resumes at frame 12
        out_b = tmp_path / "resumed"
        run_main(root / "nt_short.yaml", out_b, "--checkpoint-every", "6")
        assert (out_b / "checkpoint.npz").exists()
        run_main(root / "nt_full.yaml", out_b, "--resume")

        ts_a, p_a = trajectory.read_tum(str(out_a / "keyframe.txt"))
        ts_b, p_b = trajectory.read_tum(str(out_b / "keyframe.txt"))
        assert len(ts_a) >= 3
        assert len(ts_a) == len(ts_b) and np.allclose(ts_a, ts_b), (
            "resumed run chose different keyframes")
        d = np.abs(np.asarray(p_a) - np.asarray(p_b)).max()
        assert d < 1e-3, f"resumed trajectory diverged: max pose diff {d}"
        # pose_F covers the WHOLE sequence (restored prefix + resumed tail)
        ts_f, _ = trajectory.read_tum(str(out_b / "pose_F.txt"))
        assert len(ts_f) >= len(ts_a)

    def test_resume_with_text_smoke(self, disk_dataset, tmp_path):
        """Text-on resume keeps tracking and lands a sane ATE."""
        root, gt_poses = disk_dataset
        write_yaml(root / "t_short.yaml", 0, str(root), "Imshort")
        out = tmp_path / "resumed_text"
        run_main(root / "t_short.yaml", out, "--checkpoint-every", "6")
        run_main(root / "exp0.yaml", out, "--resume")
        from textslam_tpu.io import trajectory
        import jax.numpy as jnp
        from textslam_tpu.geometry import se3

        ts, poses_wc = trajectory.read_tum(str(out / "keyframe.txt"))
        assert len(ts) >= 3
        poses_cw = np.asarray(se3.inverse(jnp.asarray(np.asarray(poses_wc))))
        ate = synth.ate_rmse([t * 10.0 for t in ts], poses_cw, gt_poses)
        assert ate < 0.05, f"text-on resumed ATE {ate:.4f}"
