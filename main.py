#!/usr/bin/env python3
"""CLI driver: `python main.py <config>.yaml [output_dir] [options]`.

Mirrors the reference binary (`./TextSLAM <cfg>.yaml`, main.cpp:30-98):
load the experiment yaml, iterate the image list, feed frames + precomputed
text detections to the system, write `keyframe_latest.txt` after every
keyframe and `keyframe.txt` at the end (TUM format).

Beyond the reference (SURVEY.md §5 checkpoint/resume):
  --checkpoint-every N   save a resumable checkpoint every N frames
                         (<output_dir>/checkpoint.npz, atomic rename)
  --resume               continue from that checkpoint if present
"""

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser(
        description="TextSLAM-TPU CLI (reference: ./TextSLAM <cfg>.yaml)")
    ap.add_argument("config", help="experiment yaml")
    ap.add_argument("output_dir", nargs="?", default=".")
    ap.add_argument("--checkpoint-every", type=int, default=0, metavar="N",
                    help="save a resumable checkpoint every N frames")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <output_dir>/checkpoint.npz if present")
    args = ap.parse_args()

    import dataclasses

    from textslam_tpu.config import MapConfig, load_yaml
    from textslam_tpu.io.dataset import Dataset
    from textslam_tpu.system import TextSLAM

    cfg = load_yaml(args.config)
    out_dir = args.output_dir
    os.makedirs(out_dir, exist_ok=True)
    ckpt_path = os.path.join(out_dir, "checkpoint.npz")

    ds = Dataset(cfg)
    # pool caps from the image-list length (the reference's param_M rule,
    # src/system.cc:23-29) — saturation then needs a keyframe cadence
    # outside the reference's own design envelope, and is graceful anyway
    cfg = dataclasses.replace(
        cfg, map=MapConfig.derive(len(ds), cfg.camera.fps, cfg.map))
    print(f"[cfg] pools from {len(ds)} images @ {cfg.camera.fps:.0f} fps: "
          f"kfs={cfg.map.max_keyframes} pts={cfg.map.max_points} "
          f"texts={cfg.map.max_texts}")
    slam = TextSLAM(cfg, output_dir=out_dir)
    start = 0
    if args.resume and os.path.exists(ckpt_path):
        extra = slam.load_checkpoint(ckpt_path)
        start = int(extra.get("frame_index", -1)) + 1
        print(f"[resume] checkpoint at frame {start - 1}: "
              f"kfs={len(slam.map.keyframes)} pts={slam.map.n_points} "
              f"texts={slam.map.n_texts}; continuing at frame {start}")
    t0 = time.time()
    times = []
    for i in range(start, len(ds)):
        img, ts, dets = ds[i]
        t1 = time.time()
        slam.track_monocular(img, ts, detections=dets)
        times.append(time.time() - t1)
        if i % 500 == 0:
            print(f"[{i}/{len(ds)}] kfs={len(slam.map.keyframes)} "
                  f"pts={slam.map.n_points} texts={slam.map.n_texts}")
        if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
            # atomic: write aside, rename over (crash mid-save keeps the
            # previous checkpoint usable)
            tmp = ckpt_path + ".tmp.npz"
            slam.save_checkpoint(tmp, extra={"frame_index": i})
            os.replace(tmp, ckpt_path)
    slam.record_keyframes(os.path.join(out_dir, "keyframe.txt"))
    slam.record_frames(os.path.join(out_dir, "pose_F.txt"))
    dt = time.time() - t0
    import numpy as np

    n_done = len(ds) - start
    print(f"done: {n_done} frames in {dt:.1f}s "
          f"({n_done/max(dt,1e-9):.2f} fps, median {np.median(times)*1000:.0f} ms/frame)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
