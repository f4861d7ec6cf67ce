"""Sky segmentation masks for a converted Waymo sequence.

The reference uses GroundingDINO + SAM checkpoints for this step
(ref: script/waymo/generate_sky_mask.py:1-190) — multi-GB pretrained
models that cannot ship with the framework. This port keeps the same
CLI and output contract (`sky_mask/{frame:06d}_{cam}.png`, white = sky)
with two backends:

  * --backend onnx <model.onnx>: any semantic-segmentation ONNX model
    with a sky class (e.g. exported SegFormer/Mask2Former); needs
    onnxruntime installed.
  * --backend gradient (default): a fast classical fallback —
    flood-fill from the top image rows over a brightness/blue-dominance
    prior. Crude but unblocks the sky-loss path when no checkpoints are
    available; swap in real masks for quality runs.
"""

import argparse
import os
import sys
from glob import glob

import cv2
import numpy as np


def gradient_sky_mask(img: np.ndarray) -> np.ndarray:
    """Classical heuristic: bright/blue-ish regions connected to the top
    border."""
    h, w = img.shape[:2]
    b, g, r = img[..., 0].astype(int), img[..., 1].astype(int), img[..., 2].astype(int)
    brightness = (b + g + r) / 3.0
    blueish = b >= r - 10
    candidate = ((brightness > 110) & blueish) | (brightness > 200)
    candidate = cv2.morphologyEx(
        candidate.astype(np.uint8), cv2.MORPH_CLOSE, np.ones((7, 7), np.uint8)
    )
    # keep only components touching the top 5% of the image
    n, labels = cv2.connectedComponents(candidate)
    top = np.unique(labels[: max(h // 20, 1)])
    mask = np.isin(labels, top[top != 0])
    return (mask * 255).astype(np.uint8)


def onnx_sky_mask(session, input_name, sky_class, img):
    x = cv2.resize(img, (1024, 1024)).astype(np.float32) / 255.0
    x = (x - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    x = x.transpose(2, 0, 1)[None]
    (logits,) = session.run(None, {input_name: x.astype(np.float32)})
    pred = logits[0].argmax(0).astype(np.uint8)
    mask = (pred == sky_class).astype(np.uint8) * 255
    return cv2.resize(mask, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_NEAREST)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", required=True)
    parser.add_argument("--backend", choices=["gradient", "onnx"], default="gradient")
    parser.add_argument("--onnx_model", default=None)
    parser.add_argument("--sky_class", type=int, default=2)  # ADE20k sky
    args = parser.parse_args()

    session = input_name = None
    if args.backend == "onnx":
        import onnxruntime as ort

        session = ort.InferenceSession(args.onnx_model)
        input_name = session.get_inputs()[0].name

    save_dir = os.path.join(args.datadir, "sky_mask")
    os.makedirs(save_dir, exist_ok=True)
    files = sorted(
        glob(os.path.join(args.datadir, "images", "*.png"))
        + glob(os.path.join(args.datadir, "images", "*.jpg"))
    )
    for fn in files:
        img = cv2.imread(fn)
        if args.backend == "onnx":
            mask = onnx_sky_mask(session, input_name, args.sky_class, img)
        else:
            mask = gradient_sky_mask(img)
        cv2.imwrite(os.path.join(save_dir, os.path.basename(fn).split(".")[0] + ".png"), mask)
    print(f"wrote {len(files)} sky masks to {save_dir} (backend={args.backend})")


if __name__ == "__main__":
    main()
