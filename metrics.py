"""CLI: offline PSNR/SSIM metrics over saved renders
(ref analog: metrics.py:26-104 at the reference root)."""

import json

from street_gaussians_tpu.config import config_from_args, make_argparser
from street_gaussians_tpu.runner import evaluate_metrics

if __name__ == "__main__":
    args = make_argparser("street_gaussians_tpu metrics").parse_args()
    cfg = config_from_args(args)
    cfg.mode = "evaluate"
    results = evaluate_metrics(cfg)
    for split, r in results.items():
        print(f"{split}: PSNR {r['psnr']:.3f} SSIM {r['ssim']:.4f}")
    print(json.dumps({k: {m: v[m] for m in ("psnr", "ssim")} for k, v in results.items()}))
