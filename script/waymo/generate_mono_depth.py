"""Monocular depth maps for a converted Waymo sequence.

The reference runs a MiDaS DPT checkpoint (ref:
script/waymo/generate_mono_depth.py:1-90; the supervision hooks exist in
config — lambda_depth_mono — but the reference train loop never consumes
them). This port keeps the CLI/output contract
(`mono_depth/{frame:06d}_{cam}.npy`, inverse-depth float32) with an ONNX
backend: export any MiDaS/DPT model to ONNX and pass --onnx_model.
Without a model the script exits with instructions instead of
downloading multi-GB checkpoints.
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
    parser.add_argument("--input_size", type=int, default=384)
    args = parser.parse_args()

    if not args.onnx_model or not os.path.exists(args.onnx_model):
        print(
            "generate_mono_depth needs a depth model: export MiDaS/DPT to "
            "ONNX and pass --onnx_model <path>. (Mono-depth supervision is "
            "optional — the reference's train loop never consumes it either; "
            "lib/config/config.py:77 lambda_depth_mono defaults to 0.)"
        )
        sys.exit(1)

    import onnxruntime as ort

    session = ort.InferenceSession(args.onnx_model)
    input_name = session.get_inputs()[0].name

    save_dir = os.path.join(args.datadir, "mono_depth")
    os.makedirs(save_dir, exist_ok=True)
    files = sorted(
        glob(os.path.join(args.datadir, "images", "*.png"))
        + glob(os.path.join(args.datadir, "images", "*.jpg"))
    )
    for fn in files:
        img = cv2.imread(fn)[..., ::-1].astype(np.float32) / 255.0
        h, w = img.shape[:2]
        x = cv2.resize(img, (args.input_size, args.input_size))
        x = ((x - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]).transpose(2, 0, 1)[None]
        (depth,) = session.run(None, {input_name: x.astype(np.float32)})
        depth = cv2.resize(depth.squeeze(), (w, h))
        np.save(
            os.path.join(save_dir, os.path.basename(fn).split(".")[0] + ".npy"),
            depth.astype(np.float32),
        )
    print(f"wrote {len(files)} mono depth maps to {save_dir}")


if __name__ == "__main__":
    main()
