"""LPIPS architecture parity: the JAX implementation must match a torch
reconstruction of the reference's lpipsPyTorch pipeline
(ref: lib/utils/lpipsPyTorch/modules/) bit-for-bit in structure. Run
with RANDOM weights — the published calibration weights cannot ship,
but conv/pool/normalize/lin semantics are fully exercised; with real
weights loaded the same code path produces the calibrated metric.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from street_gaussians_tpu.utils.lpips import (
    _ALEX_ARCH,
    _ALEX_CHANNELS,
    _ALEX_TARGETS,
    lpips_from_weights,
)


def make_random_weights(rng):
    weights = {}
    in_ch = 3
    conv_i = 0
    for layer in _ALEX_ARCH:
        if layer[0] == "conv":
            _, out_ch, k, s, p = layer
            weights[f"conv{conv_i}.weight"] = (
                rng.standard_normal((out_ch, in_ch, k, k)).astype(np.float32) * 0.05
            )
            weights[f"conv{conv_i}.bias"] = (
                rng.standard_normal(out_ch).astype(np.float32) * 0.05
            )
            in_ch = out_ch
            conv_i += 1
    for li, ch in enumerate(_ALEX_CHANNELS):
        weights[f"lin{li}.weight"] = np.abs(
            rng.standard_normal((1, ch, 1, 1)).astype(np.float32)
        )
    return weights


def torch_lpips(pred, gt, weights):
    """Literal reconstruction of the reference pipeline in torch."""
    import torch.nn as nn

    mods = []
    conv_i = 0
    for layer in _ALEX_ARCH:
        if layer[0] == "conv":
            _, out_ch, k, s, p = layer
            w = torch.from_numpy(weights[f"conv{conv_i}.weight"])
            c = nn.Conv2d(w.shape[1], out_ch, k, s, p)
            c.weight.data = w
            c.bias.data = torch.from_numpy(weights[f"conv{conv_i}.bias"])
            mods.append(c)
            conv_i += 1
        elif layer[0] == "relu":
            mods.append(nn.ReLU())
        elif layer[0] == "pool":
            mods.append(nn.MaxPool2d(3, 2))

    mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
        x = (x - mean) / std
        out = []
        for i, m in enumerate(mods, 1):
            x = m(x)
            if i in _ALEX_TARGETS:
                norm = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                out.append(x / (norm + 1e-10))
        return out

    with torch.no_grad():
        fx, fy = feats(pred), feats(gt)
        total = 0.0
        for li, (a, b) in enumerate(zip(fx, fy)):
            d = (a - b) ** 2
            lin = torch.from_numpy(weights[f"lin{li}.weight"])
            layer = torch.nn.functional.conv2d(d, lin)
            total = total + layer.mean((2, 3))
    return float(total)


def test_lpips_matches_torch_reconstruction():
    rng = np.random.default_rng(0)
    weights = make_random_weights(rng)
    pred = rng.random((64, 96, 3)).astype(np.float32)
    gt = np.clip(pred + 0.1 * rng.standard_normal(pred.shape), 0, 1).astype(
        np.float32
    )
    want = torch_lpips(pred, gt, weights)
    got = float(lpips_from_weights(pred, gt, weights))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_lpips_zero_for_identical_images():
    rng = np.random.default_rng(1)
    weights = make_random_weights(rng)
    img = rng.random((32, 48, 3)).astype(np.float32)
    assert abs(float(lpips_from_weights(img, img, weights))) < 1e-9


def test_lpips_none_without_weights(monkeypatch):
    from street_gaussians_tpu.utils import lpips as L

    monkeypatch.setattr(L, "_cache", {})
    monkeypatch.delenv("SGTPU_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "_hub_dir", lambda: "/nonexistent")
    img = np.zeros((8, 8, 3), np.float32)
    assert L.lpips(img, img) is None
