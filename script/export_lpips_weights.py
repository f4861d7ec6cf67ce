"""Export LPIPS weights to the framework's canonical .npz.

Run this once on a machine WITH network access / the checkpoints, then
point `SGTPU_LPIPS_WEIGHTS` at the output on the training host:

  python script/export_lpips_weights.py \
      --backbone ~/.cache/torch/hub/checkpoints/alexnet-owt-7be5be79.pth \
      --lin ~/.cache/torch/hub/checkpoints/alex.pth \
      --net alex --out /path/to/lpips_weights.npz

The lin checkpoint is richzhang/PerceptualSimilarity
lpips/weights/v0.1/<net>.pth (the reference downloads it at run time,
ref: lib/utils/lpipsPyTorch/modules/utils.py:12-30); the backbone is
the torchvision IMAGENET1K_V1 state dict.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", required=True)
    ap.add_argument("--lin", required=True)
    ap.add_argument("--net", default="alex", choices=["alex", "vgg"])
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    backbone = torch.load(args.backbone, map_location="cpu", weights_only=True)
    lin = torch.load(args.lin, map_location="cpu", weights_only=True)

    out = {}
    conv_i = 0
    idxs = sorted(
        {int(k.split(".")[1]) for k in backbone if k.startswith("features.")}
    )
    for idx in idxs:
        wk, bk = f"features.{idx}.weight", f"features.{idx}.bias"
        if wk in backbone:
            out[f"{args.net}.conv{conv_i}.weight"] = backbone[wk].numpy()
            out[f"{args.net}.conv{conv_i}.bias"] = backbone[bk].numpy()
            conv_i += 1
    for li in range(5):
        for key in (f"lin{li}.model.1.weight", f"{li}.1.weight", f"lin{li}.weight"):
            if key in lin:
                out[f"{args.net}.lin{li}.weight"] = lin[key].numpy()
                break
        else:
            raise SystemExit(f"lin layer {li} not found in {args.lin}")

    np.savez(args.out, **out)
    print(f"wrote {len(out)} arrays to {args.out}")


if __name__ == "__main__":
    main()
