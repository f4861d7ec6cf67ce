"""Serving-path capacity management in runner.render_sets (round 3):
the auto-size probe tightens instance_capacity to the scene's measured
demand, and the overflow guard grows it back and RE-RENDERS any frame
the probe underestimated — capacity shortcuts must never drop blend
contributors (ref semantics: forward.cu:390-455 blends every instance)."""

import json
import os

import numpy as np
import pytest

from street_gaussians_tpu.config import load_config
from street_gaussians_tpu.data import waymo
from street_gaussians_tpu.data.synthetic_waymo import write_synthetic_waymo


@pytest.fixture(autouse=True)
def small_sensors(monkeypatch):
    monkeypatch.setattr(waymo, "IMAGE_HEIGHTS", [64] * 5)
    monkeypatch.setattr(waymo, "IMAGE_WIDTHS", [96] * 5)


def _cfg(tmp_path, root):
    cfg = load_config()
    cfg.source_path = root
    cfg.model_path = str(tmp_path / "out")
    cfg.trained_model_dir = os.path.join(cfg.model_path, "trained_model")
    cfg.point_cloud_dir = os.path.join(cfg.model_path, "point_cloud")
    cfg.record_dir = os.path.join(cfg.model_path, "record")
    cfg.mode = "train"
    cfg.data.type = "Waymo"
    cfg.data.split_train = 1
    cfg.data.split_test = -1
    cfg.data.cameras = [0]
    cfg.model.nsg.include_sky = False
    cfg.optim.densify_until_iter = 0
    cfg.optim.opacity_reset_interval = 10 ** 6
    cfg.train.iterations = 4
    cfg.train.test_iterations = []
    cfg.train.save_iterations = []
    cfg.train.checkpoint_iterations = [4]
    cfg.render.tile_capacity = 0
    cfg.render.instance_capacity = 32768
    return cfg


def test_render_sets_auto_sizes_capacity(tmp_path):
    root = str(tmp_path / "seq")
    write_synthetic_waymo(root, num_frames=3, cameras=(0,))
    cfg = _cfg(tmp_path, root)

    from street_gaussians_tpu.runner import render_sets, training

    training(cfg, progress=False)
    out = render_sets(cfg)
    # the toy scene needs far fewer than 32768 instances: the probe must
    # have tightened the serving capacity...
    assert int(cfg.render.instance_capacity) < 32768
    # ...and every frame still rendered (no drops: the regrow guard
    # would have re-raised it otherwise)
    split_dir = os.path.join(cfg.model_path, "train_renders")
    assert len(os.listdir(split_dir)) == 3
    assert "fps" in out


def test_render_sets_regrows_on_overflow(tmp_path):
    root = str(tmp_path / "seq")
    write_synthetic_waymo(root, num_frames=3, cameras=(0,))
    cfg = _cfg(tmp_path, root)

    from street_gaussians_tpu.runner import render_sets, training

    training(cfg, progress=False)
    # starve the capacity below the real demand and disable the probe:
    # the per-frame overflow guard must grow it until frames fit
    cfg.render.auto_size_capacity = False
    cfg.render.instance_capacity = 128
    render_sets(cfg)
    assert int(cfg.render.instance_capacity) > 128
    split_dir = os.path.join(cfg.model_path, "train_renders")
    imgs = os.listdir(split_dir)
    assert len(imgs) == 3


def test_render_sets_ceiling_renders_with_drops(tmp_path, capsys):
    """When a frame's demand exceeds max_instance_capacity, the regrow
    loop must stop at the ceiling and render WITH documented drops —
    not retry the same capacity 8 times (regression: the 30k-protocol
    render re-rendered one over-ceiling view 8x at identical capacity,
    round 5)."""
    root = str(tmp_path / "seq")
    write_synthetic_waymo(root, num_frames=2, cameras=(0,))
    cfg = _cfg(tmp_path, root)

    from street_gaussians_tpu.runner import render_sets, training

    training(cfg, progress=False)
    cfg.render.auto_size_capacity = False
    cfg.render.instance_capacity = 256
    cfg.render.max_instance_capacity = 256  # below the scene's demand
    out = render_sets(cfg)
    text = capsys.readouterr().out
    assert "demand exceeds max_instance_capacity" in text
    # at most one regrow attempt per frame before hitting the ceiling
    assert text.count("demand exceeds") <= 4
    assert "fps" in out
    imgs = os.listdir(os.path.join(cfg.model_path, "train_renders"))
    assert len(imgs) == 2
