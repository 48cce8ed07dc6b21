#!/usr/bin/env python3
"""CLI driver: `python main.py <config>.yaml [output_dir]`.

Mirrors the reference binary (`./TextSLAM <cfg>.yaml`, main.cpp:30-98):
load the experiment yaml, iterate the image list, feed frames + precomputed
text detections to the system, write `keyframe_latest.txt` after every
keyframe and `keyframe.txt` at the end (TUM format).
"""

import os
import sys
import time


def main():
    if len(sys.argv) < 2:
        print("usage: python main.py <config>.yaml [output_dir]", file=sys.stderr)
        return 1
    from textslam_tpu.config import load_yaml
    from textslam_tpu.io.dataset import Dataset
    from textslam_tpu.system import TextSLAM

    cfg = load_yaml(sys.argv[1])
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "."
    os.makedirs(out_dir, exist_ok=True)

    ds = Dataset(cfg)
    slam = TextSLAM(cfg, output_dir=out_dir)
    t0 = time.time()
    times = []
    for i in range(len(ds)):
        img, ts, dets = ds[i]
        t1 = time.time()
        slam.track_monocular(img, ts, detections=dets)
        times.append(time.time() - t1)
        if i % 500 == 0:
            print(f"[{i}/{len(ds)}] kfs={len(slam.map.keyframes)} "
                  f"pts={slam.map.n_points} texts={slam.map.n_texts}")
    slam.record_keyframes(os.path.join(out_dir, "keyframe.txt"))
    slam.record_frames(os.path.join(out_dir, "pose_F.txt"))
    dt = time.time() - t0
    import numpy as np

    print(f"done: {len(ds)} frames in {dt:.1f}s "
          f"({len(ds)/max(dt,1e-9):.2f} fps, median {np.median(times)*1000:.0f} ms/frame)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
