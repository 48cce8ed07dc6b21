#!/usr/bin/env python3
"""Measured stand-in for the reference's PER-FRAME front-end cost
(VERDICT r3 next #1a: "a reference front-end wall-clock baseline").

The reference's frame constructor + matcher (the per-frame hot path,
SURVEY.md §3 "hot loops") is OpenCV calls end to end:

- 8-level x2 cv::pyrDown pyramid + cv::Sobel x/y + addWeighted per level
  (src/frame.cc:178-204)
- scene ORB: ORB-SLAM2's extractor at (1000 feats, 1.2, 8 levels, FAST
  20->7) — a modified copy of OpenCV's ORB (src/ORBextractor.h:1-19);
  replicated here by cv2.ORB_create with the same parameters
- per-text-box ORB: the reference literally calls stock
  `cv::ORB::create()` per box on the box-masked image + a descriptor
  compute on the full image (FeatExtracText, src/frame.cc:334-356);
  replicated verbatim
- SearchFrom3D matching: project all map points, grid lookup radius 18,
  Hamming distance against candidate descriptors TH_HIGH=100
  (src/tracking.cc:1124-1273); replicated as projection + per-point
  candidate Hamming over a 64x48 grid

Single-threaded (cv2.setNumThreads(1)) like the reference
(src/optimizer.cc:1600 et al.; no threads anywhere). Images are synthetic
textured frames (the cost of these kernels is content-independent to first
order). Output: one JSON line consumed by BASELINE.md.
"""

import json
import os
import sys
import time

import numpy as np

try:
    import cv2
except ImportError:
    print(json.dumps({"error": "cv2 unavailable"}))
    sys.exit(0)

cv2.setNumThreads(1)

H, W = 480, 640
N_LEVELS_PYR = 8  # direct pyramid (x2), src/tracking.cc:35-36
N_BOXES = 6
rng = np.random.default_rng(0)


def make_frame(seed):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = (128 + 60 * np.sin(xx / 7.0 + seed) * np.cos(yy / 9.0)
           + 40 * np.sin((xx + 2 * yy) / 13.0)
           + r.normal(0, 6, (H, W))).clip(0, 255)
    return img.astype(np.uint8)


def boxes_for(seed):
    r = np.random.default_rng(seed + 100)
    out = []
    for _ in range(N_BOXES):
        x0 = int(r.uniform(30, W - 130))
        y0 = int(r.uniform(30, H - 90))
        out.append((x0, y0, int(r.uniform(60, 100)), int(r.uniform(30, 50))))
    return out


def phase_pyramid(img):
    levels = [img]
    for _ in range(1, N_LEVELS_PYR):
        levels.append(cv2.pyrDown(levels[-1]))
    for lv in levels:
        gx = cv2.Sobel(lv, cv2.CV_8U, 1, 0, ksize=3)
        gy = cv2.Sobel(lv, cv2.CV_8U, 0, 1, ksize=3)
        cv2.addWeighted(gx, 0.5, gy, 0.5, 0)
    return levels


SCENE_ORB = cv2.ORB_create(nfeatures=1000, scaleFactor=1.2, nlevels=8,
                           fastThreshold=20)


def phase_scene_orb(img):
    return SCENE_ORB.detectAndCompute(img, None)


def phase_box_orb(img, boxes):
    # FeatExtracText: fresh stock ORB per box, detect on masked image,
    # compute on the full image (src/frame.cc:334-356)
    outs = []
    for (x0, y0, w, h) in boxes:
        masked = np.zeros_like(img)
        masked[y0:y0 + h, x0:x0 + w] = img[y0:y0 + h, x0:x0 + w]
        det = cv2.ORB_create()
        kp = det.detect(masked, None)
        ext = cv2.ORB_create()
        kp, desc = ext.compute(img, kp)
        outs.append((kp, desc))
    return outs


def measure_search3d(n_pts=2000, n_kp=1000, n_frames=50):
    """SearchFrom3D cost measured by the C++ single-thread replica
    (search3d_bench.cpp) — a python loop here would overstate the
    reference's cost ~150x. Compiled on demand; returns ms/frame."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "search3d_bench.cpp")
    exe = os.path.join(here, "search3d_bench")
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                        "-o", exe, src], check=True, timeout=240)
    out = subprocess.run([exe, str(n_pts), str(n_kp), str(n_frames)],
                         capture_output=True, check=True, timeout=300)
    return float(json.loads(out.stdout)["search3d_ms"])


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    frames = [make_frame(s) for s in range(4)]
    all_boxes = [boxes_for(s) for s in range(4)]

    # warmup
    phase_pyramid(frames[0])
    phase_scene_orb(frames[0])

    t_pyr = t_orb = t_box = 0.0
    for i in range(n_frames):
        img = frames[i % 4]
        boxes = all_boxes[i % 4]
        t0 = time.perf_counter()
        phase_pyramid(img)
        t1 = time.perf_counter()
        kp, desc = phase_scene_orb(img)
        t2 = time.perf_counter()
        phase_box_orb(img, boxes)
        t3 = time.perf_counter()
        t_pyr += t1 - t0
        t_orb += t2 - t1
        t_box += t3 - t2

    per = {
        "pyramid_sobel_ms": round(t_pyr / n_frames * 1000, 2),
        "scene_orb_ms": round(t_orb / n_frames * 1000, 2),
        "box_orb_ms": round(t_box / n_frames * 1000, 2),
        "search3d_ms": round(measure_search3d(), 2),
    }
    total = sum(per.values())
    out = {
        "metric": "ref_frontend_ms_per_frame",
        "value": round(total, 2),
        "unit": ("ms/frame, single-thread OpenCV replica of the reference "
                 "front end (8-level x2 pyramid+Sobel, ORB 1000/1.2/8, "
                 f"{N_BOXES} per-box stock-ORB passes, SearchFrom3D over "
                 "2000 map points)"),
        "phases": per,
        "fps_equiv": round(1000.0 / total, 2),
    }
    print(json.dumps(out))
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "measured_frontend.json")
    with open(cache, "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
