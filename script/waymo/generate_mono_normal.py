"""Monocular normal maps for a converted Waymo sequence.

The reference delegates to an external DSINE checkout at a hardcoded
path (ref: script/waymo/generate_mono_normal.py:13-15; the
lambda_normal_mono hook exists in config but the reference train loop
never consumes it). Same ONNX-backend contract as generate_mono_depth:
`mono_normal/{frame:06d}_{cam}.npy`, [H, W, 3] float32 camera-space
normals.
"""

import argparse
import os
import sys
from glob import glob

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", required=True)
    parser.add_argument("--onnx_model", default=None)
    parser.add_argument("--input_size", type=int, default=512)
    args = parser.parse_args()

    if not args.onnx_model or not os.path.exists(args.onnx_model):
        print(
            "generate_mono_normal needs a normal-estimation model (e.g. DSINE "
            "exported to ONNX): pass --onnx_model <path>. Normal supervision "
            "is optional; the reference train loop never consumes it "
            "(lib/config/config.py:78)."
        )
        sys.exit(1)

    import onnxruntime as ort

    session = ort.InferenceSession(args.onnx_model)
    input_name = session.get_inputs()[0].name

    save_dir = os.path.join(args.datadir, "mono_normal")
    os.makedirs(save_dir, exist_ok=True)
    files = sorted(
        glob(os.path.join(args.datadir, "images", "*.png"))
        + glob(os.path.join(args.datadir, "images", "*.jpg"))
    )
    for fn in files:
        img = cv2.imread(fn)[..., ::-1].astype(np.float32) / 255.0
        h, w = img.shape[:2]
        x = cv2.resize(img, (args.input_size, args.input_size)).transpose(2, 0, 1)[None]
        (normal,) = session.run(None, {input_name: x.astype(np.float32)})
        normal = normal.squeeze().transpose(1, 2, 0)
        normal = cv2.resize(normal, (w, h))
        n = normal / np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
        np.save(
            os.path.join(save_dir, os.path.basename(fn).split(".")[0] + ".npy"),
            n.astype(np.float32),
        )
    print(f"wrote {len(files)} normal maps to {save_dir}")


if __name__ == "__main__":
    main()
