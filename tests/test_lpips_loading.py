"""Round-trip tests for the LPIPS weight-loading paths (VERDICT r2 weak 6):
`_load_torch`'s key-matching over realistically-shaped synthetic torch
state dicts in BOTH published naming schemes, and the
script/export_lpips_weights.py -> .npz -> `_load_npz` pipeline — so
metrics produce LPIPS the first time real weights appear instead of
silently returning None on a key mismatch.

Ref: lib/utils/lpipsPyTorch/modules/lpips.py:1-36 (the reference
downloads richzhang lin checkpoints at run time; this framework loads
them from a documented local path instead).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from street_gaussians_tpu.utils import lpips as L

# torchvision alexnet().features conv indices and (out, in, k, k) shapes
_ALEX_SHAPES = {
    0: (64, 3, 11, 11),
    3: (192, 64, 5, 5),
    6: (384, 192, 3, 3),
    8: (256, 384, 3, 3),
    10: (256, 256, 3, 3),
}
_ALEX_LIN_CH = (64, 192, 384, 256, 256)


def _synthetic_backbone(rng):
    sd = {}
    for idx, shape in _ALEX_SHAPES.items():
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.standard_normal(shape).astype(np.float32) * 0.05
        )
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.standard_normal(shape[0]).astype(np.float32) * 0.05
        )
    # classifier keys must be ignored by the loader
    sd["classifier.1.weight"] = torch.zeros(8, 8)
    return sd


def _synthetic_lin(rng, scheme):
    """scheme: 'wrapped' = lin{li}.model.1.weight (richzhang LPIPS class
    export), 'bare' = {li}.1.weight (raw v0.1 checkpoint files)."""
    sd = {}
    for li, ch in enumerate(_ALEX_LIN_CH):
        w = torch.tensor(np.abs(rng.standard_normal((1, ch, 1, 1))).astype(np.float32))
        key = f"lin{li}.model.1.weight" if scheme == "wrapped" else f"{li}.1.weight"
        sd[key] = w
    return sd


@pytest.fixture
def fake_hub(tmp_path, monkeypatch):
    hub = tmp_path / "hub"
    hub.mkdir()
    monkeypatch.setattr(L, "_hub_dir", lambda: str(hub))
    monkeypatch.delenv("SGTPU_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "_cache", {})
    return hub


@pytest.mark.parametrize("scheme", ["wrapped", "bare"])
def test_load_torch_both_naming_schemes(fake_hub, scheme):
    rng = np.random.default_rng(0)
    torch.save(_synthetic_backbone(rng), fake_hub / "alexnet-owt-7be5be79.pth")
    torch.save(_synthetic_lin(rng, scheme), fake_hub / "alex.pth")

    w = L.load_weights("alex")
    assert w is not None, f"loader returned None for scheme {scheme!r}"
    for i in range(5):
        assert f"conv{i}.weight" in w and f"conv{i}.bias" in w
        assert w[f"lin{i}.weight"].shape == (1, _ALEX_LIN_CH[i], 1, 1)
    assert w["conv0.weight"].shape == _ALEX_SHAPES[0]

    rng2 = np.random.default_rng(1)
    pred = rng2.random((64, 64, 3)).astype(np.float32)
    gt = rng2.random((64, 64, 3)).astype(np.float32)
    val = L.lpips(pred, gt)
    assert val is not None and np.isfinite(val) and val > 0.0
    assert abs(L.lpips(pred, pred)) < 1e-9


def test_export_script_npz_roundtrip(fake_hub, tmp_path, monkeypatch):
    """export_lpips_weights.py on the synthetic checkpoints must produce
    an .npz whose `_load_npz` result gives the SAME LPIPS value as the
    direct torch-hub path."""
    rng = np.random.default_rng(2)
    backbone_p = fake_hub / "alexnet-owt-7be5be79.pth"
    lin_p = fake_hub / "alex.pth"
    torch.save(_synthetic_backbone(rng), backbone_p)
    torch.save(_synthetic_lin(rng, "wrapped"), lin_p)

    w_torch = L.load_weights("alex")
    assert w_torch is not None

    spec = importlib.util.spec_from_file_location(
        "export_lpips_weights",
        os.path.join(os.path.dirname(__file__), "..", "script", "export_lpips_weights.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_npz = str(tmp_path / "lpips_weights.npz")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "export_lpips_weights.py",
            "--backbone", str(backbone_p),
            "--lin", str(lin_p),
            "--net", "alex",
            "--out", out_npz,
        ],
    )
    mod.main()
    assert os.path.exists(out_npz)

    monkeypatch.setenv("SGTPU_LPIPS_WEIGHTS", out_npz)
    monkeypatch.setattr(L, "_cache", {})
    w_npz = L.load_weights("alex")
    assert w_npz is not None
    assert set(w_npz) == set(w_torch)
    for k in w_torch:
        np.testing.assert_array_equal(np.asarray(w_npz[k]), np.asarray(w_torch[k]))

    rng2 = np.random.default_rng(3)
    pred = rng2.random((64, 64, 3)).astype(np.float32)
    gt = rng2.random((64, 64, 3)).astype(np.float32)
    v_npz = float(L.lpips_from_weights(pred, gt, w_npz))
    v_torch = float(L.lpips_from_weights(pred, gt, w_torch))
    assert np.isclose(v_npz, v_torch, rtol=0, atol=0)


def test_load_torch_missing_lin_returns_none(fake_hub):
    """A lin checkpoint under unknown key names must yield None (honest
    'no LPIPS'), not a KeyError or a half-loaded weight dict."""
    rng = np.random.default_rng(4)
    torch.save(_synthetic_backbone(rng), fake_hub / "alexnet-owt-7be5be79.pth")
    bad = {f"mystery{li}.weight": torch.zeros(1, 8, 1, 1) for li in range(5)}
    torch.save(bad, fake_hub / "alex.pth")
    assert L.load_weights("alex") is None
