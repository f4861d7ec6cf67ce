"""Known-pose COLMAP triangulation for a converted KITTI scene.

Reference equivalent: script/kitti/colmap_kitti.py:25-196 (which is
broken in the reference snapshot — it imports `lib.utils.kitti_utils`,
a module that does not exist there). Because `kitti_converter.py`
emits the Waymo on-disk layout, the known-pose triangulation pipeline
is the same one the Waymo path uses
(script/waymo/colmap_waymo_full.py: feature extraction with
dynamic-object masks, known-pose images.txt/cameras.txt, exhaustive
matching, point_triangulator); this wrapper just fixes the KITTI
camera set {0, 1}.

Usage (after kitti_converter.py):
  python script/kitti/colmap_kitti.py --source_path data/kitti/0002 \
      --model_path output/kitti/0002 [--start 0 --end 100]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "waymo"))

from colmap_waymo_full import run_colmap_waymo  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source_path", required=True, help="converted KITTI scene dir")
    ap.add_argument("--model_path", required=True, help="output model dir")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    args = ap.parse_args()

    if args.end is None:
        n = len(os.listdir(os.path.join(args.source_path, "ego_pose")))
        args.end = n // 3 - 1  # frame + 2 per-camera pose files per frame

    run_colmap_waymo(
        args.source_path,
        args.model_path,
        selected_frames=(args.start, args.end),
        cameras=(0, 1),
    )


if __name__ == "__main__":
    main()
