"""KITTI-STEP annotations -> cityscapes-colormapped semantic PNGs.

Reference equivalent: script/kitti/generate_semantic_mask.py (same
colormap, vectorized instead of a per-pixel python loop).

Usage:
  python script/kitti/generate_semantic_mask.py \
      --annotation_path <kitti_step/panoptic_maps/train/0002> \
      --output_path <scene>/semantic
"""

from __future__ import annotations

import argparse
import os

from kitti_step_masks import COLORMAP, iter_annotations, write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotation_path", required=True)
    ap.add_argument("--output_path", required=True)
    args = ap.parse_args()
    for rel, labels in iter_annotations(args.annotation_path):
        rgb = COLORMAP[labels]  # [H, W, 3] RGB
        out = os.path.join(args.output_path, rel)
        write_png(out, rgb[..., ::-1])  # cv2 writes BGR
        print(out)


if __name__ == "__main__":
    main()
