"""KITTI-STEP annotations -> static-region masks for COLMAP.

Reference equivalent: script/kitti/generate_dynamic_mask.py:59-84 —
pixels of movable classes (person/rider/car/truck/bus/train/motorcycle/
bicycle) become 0, everything else 255, i.e. a COLMAP feature-extraction
mask where white = usable (https://colmap.github.io/faq.html).

Usage:
  python script/kitti/generate_dynamic_mask.py \
      --annotation_path <kitti_step/panoptic_maps/train/0002> \
      --output_path <scene>/dynamic_mask
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from kitti_step_masks import DYNAMIC_LABELS, iter_annotations, write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotation_path", required=True)
    ap.add_argument("--output_path", required=True)
    args = ap.parse_args()
    for rel, labels in iter_annotations(args.annotation_path):
        dynamic = np.isin(labels, DYNAMIC_LABELS)
        mask = np.where(dynamic, 0, 255).astype(np.uint8)
        out = os.path.join(args.output_path, rel)
        write_png(out, mask)
        print(out)


if __name__ == "__main__":
    main()
