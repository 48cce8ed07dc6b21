import os
import numpy as np

from textslam_tpu.io import dataset, trajectory


class TestDatasetReaders:
    def test_image_list(self, tmp_path):
        p = tmp_path / "Imlist.txt"
        p.write_text("# comment\n0.033 images/0.png\n0.066 images/1.png\n")
        entries = dataset.read_image_list(str(p))
        assert entries == [(0.033, "images/0.png"), (0.066, "images/1.png")]

    def test_detections(self, tmp_path):
        (tmp_path / "3_dete.txt").write_text("10,20,110,20,110,60,10,60\n5,5,50,5,50,25,5,25\n")
        (tmp_path / "3_mean.txt").write_text("CAFE,0.93\n你好,0.8\n")
        dets = dataset.read_detections(str(tmp_path), 3)
        assert len(dets) == 2
        np.testing.assert_allclose(dets[0].quad[2], [110, 60])
        assert dets[0].text == "CAFE" and abs(dets[0].score - 0.93) < 1e-9
        assert dets[0].lang == 0
        assert dets[1].text == "你好" and dets[1].lang == 1

    def test_missing_files_empty(self, tmp_path):
        assert dataset.read_detections(str(tmp_path), 7) == []

    def test_text_dir_mapping(self):
        assert dataset.text_dir_for("/data/seq1/images") == "/data/seq1/text"

    def test_string_with_comma(self, tmp_path):
        (tmp_path / "0_dete.txt").write_text("0,0,1,0,1,1,0,1\n")
        (tmp_path / "0_mean.txt").write_text("A,B,0.5\n")
        dets = dataset.read_detections(str(tmp_path), 0)
        assert dets[0].text == "A,B" and dets[0].score == 0.5


class TestTrajectory:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(5, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        poses = np.concatenate([q, rng.normal(size=(5, 3))], -1).astype(np.float32)
        ts = np.arange(5) * 0.1
        p = tmp_path / "traj.txt"
        trajectory.write_tum(str(p), ts, poses)
        ts2, poses_wc = trajectory.read_tum(str(p))
        np.testing.assert_allclose(ts2, ts, atol=1e-6)
        # read returns Twc; invert to compare with the written Tcw
        import jax.numpy as jnp
        from textslam_tpu.geometry import se3

        back = np.asarray(se3.inverse(jnp.asarray(poses_wc)))
        sign = np.sign((back[:, :4] * poses[:, :4]).sum(-1, keepdims=True))
        np.testing.assert_allclose(back[:, :4] * sign, poses[:, :4], atol=1e-5)
        np.testing.assert_allclose(back[:, 4:], poses[:, 4:], atol=1e-5)
