"""TextSLAM dataset reader: image lists + precomputed OCR files.

Reference layout contract (src/tool.cc:21-215, main.cpp:46-84):
- `<read path>/<read list>`: lines "timestamp filename"
- text files live next to images with "images" -> "text" in the path:
  `<idx>_dete.txt`  — one detection per line, 8 comma-separated corner
                      coordinates (u1,v1,...,u4,v4)
  `<idx>_mean.txt`  — per line "string,score"; language classified from
                      UTF-8 byte lengths (src/tool.cc:163-215)
- images are undistorted up front with the camera model (cv::undistort,
  main.cpp:73); everything downstream is pure pinhole.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from ..config import TextSLAMConfig
from ..frontend.frame import TextDetection


def classify_language(s: str) -> int:
    """Language id from UTF-8 byte lengths (src/tool.cc:163-172):
    0 = english (every char 1 byte), 1 = Chinese (every char 3 bytes),
    2 = mixed (anything in between)."""
    if not s:
        return 0
    n_chars = len(s)
    n_bytes = len(s.encode("utf-8"))
    if n_bytes == n_chars:
        return 0
    if n_bytes == 3 * n_chars:
        return 1
    return 2


def read_image_list(path: str) -> List[Tuple[float, str]]:
    """Parse `Imlist.txt`-style "timestamp filename" lines."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            out.append((float(parts[0]), parts[1]))
    return out


def text_dir_for(image_path: str) -> str:
    """The reference derives the text path by replacing the FIRST "images"
    with "text" in the full image path
    (src/tool.cc:59: path.replace(Path.find("images"), 6, "text"))."""
    return image_path.replace("images", "text", 1)


def text_stem_for(read_path: str, image_name: str) -> str:
    """Per-frame text-file stem: `<read_path>/<image name minus extension>`
    with the first "images" replaced by "text" — the reference indexes text
    files by the IMAGE FILENAME STEM, not the loop counter
    (src/tool.cc:45-46 sRGB.erase(length-4) builds vImg_Idx; main.cpp:60
    ReadText(sReadPath + vImg_Idx[ni]))."""
    stem = image_name[:-4] if len(image_name) > 4 else image_name
    return text_dir_for(os.path.join(read_path, stem))


def read_detections(text_dir: str, idx=None) -> List[TextDetection]:
    """Read `<stem>_dete.txt` + `<stem>_mean.txt` for one frame.

    `text_dir` is the stem path itself when `idx` is None, else the
    directory holding `<idx>_*.txt`. Corner coordinates are rounded to
    integers like the reference (src/tool.cc:92 std::round, DOUBLE=false).
    Deviation (documented): a comma INSIDE the recognized string is kept
    (score = last comma field); the reference's char-walk parser misaligns
    all subsequent lines of the file on such input (src/tool.cc:154-199)."""
    stem = text_dir if idx is None else os.path.join(text_dir, str(idx))
    dete = f"{stem}_dete.txt"
    mean = f"{stem}_mean.txt"
    quads, infos = [], []
    if os.path.exists(dete):
        with open(dete) as f:
            for line in f:
                vals = [v for v in line.strip().replace(",", " ").split() if v]
                if len(vals) >= 8:
                    q = np.round(np.asarray(
                        [float(v) for v in vals[:8]], np.float32)).reshape(4, 2)
                    quads.append(q)
    if os.path.exists(mean):
        with open(mean, encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                # "string,score" — string may itself contain commas; score is
                # the last comma-separated field
                head, _, tail = line.rpartition(",")
                try:
                    score = float(tail)
                    string = head
                except ValueError:
                    string, score = line, 0.0
                infos.append((string, score))
    dets = []
    for i, q in enumerate(quads):
        string, score = infos[i] if i < len(infos) else ("", 0.0)
        dets.append(
            TextDetection(quad=q, text=string, score=score, lang=classify_language(string))
        )
    return dets


class Dataset:
    """Iterates (gray undistorted image, timestamp, detections)."""

    def __init__(self, cfg: TextSLAMConfig):
        import cv2

        self.cfg = cfg
        self.entries = read_image_list(os.path.join(cfg.read_path, cfg.read_list))
        cam = cfg.camera
        self._K = cam.K
        self._dist = cam.dist
        self._undistort = np.abs(self._dist).sum() > 1e-12
        if self._undistort:
            self._map1, self._map2 = cv2.initUndistortRectifyMap(
                self._K, self._dist, None, self._K,
                (cam.width, cam.height), cv2.CV_32FC1,
            )
        # native background IO: decode stays cv2, file reads overlap tracking
        from .. import native

        try:
            self._prefetch = native.Prefetcher(
                [os.path.join(cfg.read_path, n) for _, n in self.entries]
            )
        except Exception:
            self._prefetch = None

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i: int):
        import cv2

        ts, name = self.entries[i]
        if self._prefetch is not None:
            buf = np.frombuffer(self._prefetch.get(i), np.uint8)
            img = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED) if buf.size else None
        else:
            img = cv2.imread(os.path.join(self.cfg.read_path, name), cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(f"image not found: {name}")
        if img.ndim == 3:
            code = cv2.COLOR_BGR2GRAY if not self.cfg.camera.rgb else cv2.COLOR_RGB2GRAY
            img = cv2.cvtColor(img, code)
        img = img.astype(np.float32)
        if self._undistort:
            img = cv2.remap(img, self._map1, self._map2, cv2.INTER_LINEAR)
        dets = ([] if self.cfg.no_text
                else read_detections(text_stem_for(self.cfg.read_path, name)))
        return img, ts, dets
