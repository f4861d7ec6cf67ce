"""LPIPS perceptual metric — faithful JAX implementation.

Reproduces the reference's vendored lpipsPyTorch exactly
(ref: lib/utils/lpipsPyTorch/modules/lpips.py:1-36, networks.py:36-90,
utils.py:6-9): z-score the inputs with the LPIPS shift/scale constants,
run the AlexNet (or VGG16) feature stack, channel-unit-normalize each
target activation, square the difference, apply the calibrated 1x1
"lin" convolutions, average spatially and sum over layers. The
reference feeds images in [0, 1] (metrics.py:81) — so do we.

Weights cannot ship with the framework and this environment has no
network egress, so they load from a documented local path:

  1. `$SGTPU_LPIPS_WEIGHTS` — an .npz produced by
     `script/export_lpips_weights.py` from the torchvision backbone +
     richzhang/PerceptualSimilarity lin checkpoints, or
  2. the torch hub cache (~/.cache/torch/hub/checkpoints/) if the
     torchvision + LPIPS .pth files are already present.

When no weights are found, `lpips()` returns None and metrics report
PSNR/SSIM only (stated in the output instead of silently substituting a
different metric — an uncalibrated stand-in is NOT LPIPS).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# LPIPS scaling layer constants (networks.py:41-44)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature stack (torchvision models.alexnet().features):
# (out_ch, kernel, stride, pad) per conv; 'M' = maxpool k3 s2.
# Target activations are the five post-ReLU maps (networks.py:81-83).
_ALEX_ARCH = [
    ("conv", 64, 11, 4, 2),
    ("relu",),
    ("pool",),
    ("conv", 192, 5, 1, 2),
    ("relu",),
    ("pool",),
    ("conv", 384, 3, 1, 1),
    ("relu",),
    ("conv", 256, 3, 1, 1),
    ("relu",),
    ("conv", 256, 3, 1, 1),
    ("relu",),
]
_ALEX_TARGETS = (2, 5, 8, 10, 12)  # 1-based module count, as reference
_ALEX_CHANNELS = (64, 192, 384, 256, 256)

# VGG16 features (networks.py:85-90): convs all k3 s1 p1
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_VGG_TARGETS = (4, 9, 16, 23, 30)
_VGG_CHANNELS = (64, 128, 256, 512, 512)


def _vgg_arch():
    arch = []
    for v in _VGG_CFG:
        if v == "M":
            arch.append(("vpool",))
        else:
            arch.append(("conv", v, 3, 1, 1))
            arch.append(("relu",))
    return arch


def _conv(x, w, b, stride, pad):
    import jax.lax as lax

    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x, k, s):
    import jax.lax as lax

    return lax.reduce_window(
        x,
        -np.inf,
        lax.max,
        window_dimensions=(1, 1, k, k),
        window_strides=(1, 1, s, s),
        padding="VALID",
    )


def _features(x, arch, targets, weights):
    """x: [N, 3, H, W] in [0, 1]. Returns channel-normalized target
    activations."""
    import jax.numpy as jnp

    x = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    outputs = []
    conv_i = 0
    for i, layer in enumerate(arch, 1):
        kind = layer[0]
        if kind == "conv":
            _, _, k, s, p = layer
            w, b = weights[f"conv{conv_i}.weight"], weights[f"conv{conv_i}.bias"]
            x = _conv(x, w, b, s, p)
            conv_i += 1
        elif kind == "relu":
            x = jnp.maximum(x, 0.0)
        elif kind == "pool":
            x = _maxpool(x, 3, 2)
        elif kind == "vpool":
            x = _maxpool(x, 2, 2)
        if i in targets:
            norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
            outputs.append(x / (norm + 1e-10))  # utils.py:6-9
        if len(outputs) == len(targets):
            break
    return outputs


def lpips_from_weights(pred, gt, weights, net_type="alex"):
    """pred/gt: [H, W, 3] float arrays in [0, 1]."""
    import jax.numpy as jnp

    if net_type == "alex":
        arch, targets = _ALEX_ARCH, _ALEX_TARGETS
    elif net_type == "vgg":
        arch, targets = _vgg_arch(), _VGG_TARGETS
    else:
        raise ValueError(net_type)

    def prep(im):
        return jnp.asarray(im, jnp.float32).transpose(2, 0, 1)[None]

    fx = _features(prep(pred), arch, targets, weights)
    fy = _features(prep(gt), arch, targets, weights)
    total = jnp.zeros((), jnp.float32)
    for li, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        lin = jnp.asarray(weights[f"lin{li}.weight"])  # [1, C, 1, 1]
        # 1x1 conv (no bias) + spatial mean, summed over layers
        # (lpips.py:33-36)
        layer = jnp.sum(d * lin[0, :, 0, 0][None, :, None, None], axis=1)
        total = total + jnp.mean(layer)
    return total


# ---------------------------------------------------------------------------
# weight loading
# ---------------------------------------------------------------------------

_cache: Dict[str, Optional[Dict[str, np.ndarray]]] = {}


def _hub_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache", "torch", "hub", "checkpoints")


def load_weights(net_type: str = "alex") -> Optional[Dict[str, np.ndarray]]:
    """Locate backbone + lin weights; returns name->array or None."""
    if net_type in _cache:
        return _cache[net_type]
    w = _load_npz(net_type) or _load_torch(net_type)
    _cache[net_type] = w
    return w


def _load_npz(net_type):
    path = os.environ.get("SGTPU_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    try:
        data = dict(np.load(path))
    except Exception:
        return None
    prefix = f"{net_type}."
    sel = {k[len(prefix):]: v for k, v in data.items() if k.startswith(prefix)}
    return sel or None


def _load_torch(net_type):
    """Torch hub cache: torchvision backbone .pth + LPIPS lin .pth."""
    hub = _hub_dir()
    if not os.path.isdir(hub):
        return None
    try:
        import torch
    except Exception:
        return None
    backbone_tag = {"alex": "alexnet", "vgg": "vgg16"}[net_type]
    backbone = None
    lin = None
    for fn in sorted(os.listdir(hub)):
        p = os.path.join(hub, fn)
        if fn.startswith(backbone_tag) and fn.endswith(".pth"):
            backbone = torch.load(p, map_location="cpu", weights_only=True)
        if fn in (f"{net_type}.pth", f"lpips_{net_type}.pth"):
            lin = torch.load(p, map_location="cpu", weights_only=True)
    if backbone is None or lin is None:
        return None
    out = {}
    conv_i = 0
    # torchvision state dicts name convs features.<idx>.weight
    idxs = sorted(
        {int(k.split(".")[1]) for k in backbone if k.startswith("features.")}
    )
    for idx in idxs:
        wk, bk = f"features.{idx}.weight", f"features.{idx}.bias"
        if wk in backbone:
            out[f"conv{conv_i}.weight"] = backbone[wk].numpy()
            out[f"conv{conv_i}.bias"] = backbone[bk].numpy()
            conv_i += 1
    for li in range(5):
        for key in (f"lin{li}.model.1.weight", f"{li}.1.weight", f"lin{li}.weight"):
            if key in lin:
                out[f"lin{li}.weight"] = np.asarray(lin[key])
                break
    if f"lin4.weight" not in out:
        return None
    return out


def lpips(pred: np.ndarray, gt: np.ndarray, net_type: str = "alex") -> Optional[float]:
    """Reference-parity LPIPS, or None when calibrated weights are
    unavailable locally (see module docstring)."""
    w = load_weights(net_type)
    if w is None:
        return None
    val = lpips_from_weights(np.asarray(pred), np.asarray(gt), w, net_type)
    return float(val)
