"""KITTI-STEP annotations -> sky masks (255 = sky).

Reference equivalent: script/kitti/generate_sky_mask.py (label id 10).
Output format matches what the loader expects (data/waymo.py:590:
nonzero = sky), one PNG per annotation, same relative paths.

Usage:
  python script/kitti/generate_sky_mask.py \
      --annotation_path <kitti_step/panoptic_maps/train/0002> \
      --output_path <scene>/sky_mask
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from kitti_step_masks import SKY_LABEL, iter_annotations, write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotation_path", required=True)
    ap.add_argument("--output_path", required=True)
    args = ap.parse_args()
    for rel, labels in iter_annotations(args.annotation_path):
        mask = np.where(labels == SKY_LABEL, 255, 0).astype(np.uint8)
        out = os.path.join(args.output_path, rel)
        write_png(out, mask)
        print(out)


if __name__ == "__main__":
    main()
