"""Colmap / Blender reader tests on synthetic on-disk scenes."""

import json
import os

import cv2
import numpy as np
import pytest

from street_gaussians_tpu.config import load_config
from street_gaussians_tpu.utils import ply as ply_utils


def _make_blender_dataset(root):
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)
    rng = np.random.default_rng(0)
    H = W = 40

    def make_split(name, n):
        frames = []
        for i in range(n):
            ang = 2 * np.pi * i / max(n, 1)
            c2w = np.eye(4)
            c2w[:3, 3] = [3 * np.cos(ang), 3 * np.sin(ang), 0.5]
            # look at origin: build OpenGL-style camera (z back)
            fwd = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
            right = np.cross(fwd, [0, 0, 1.0])
            right /= np.linalg.norm(right)
            up = np.cross(right, fwd)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -fwd
            img = rng.integers(0, 255, (H, W, 4), dtype=np.uint8)
            cv2.imwrite(os.path.join(root, name, f"r_{i}.png"), img)
            frames.append(
                {"file_path": f"./{name}/r_{i}", "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(root, f"transforms_{name}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    make_split("train", 4)
    make_split("test", 2)


def test_blender_reader(tmp_path):
    root = str(tmp_path / "blender")
    _make_blender_dataset(root)
    cfg = load_config()
    cfg.source_path = root
    cfg.data.type = "Blender"
    cfg.data.eval = True
    from street_gaussians_tpu.runner import build_scene

    scene = build_scene(cfg)
    assert len(scene.train_views) == 4
    assert len(scene.test_views) == 2
    assert scene.table.num_models == 1  # background only
    assert os.path.exists(os.path.join(root, "points3d.ply"))  # random init persisted
    # render one view end-to-end
    import dataclasses
    import jax.numpy as jnp
    from street_gaussians_tpu.models.renderer import RenderOptions, SceneParams, render_frame

    params = SceneParams(scene.params_init, None, None, None, None)
    out = render_frame(
        params, scene.aux_init, scene.table, None, scene.train_views[0].frame_input,
        step=jnp.asarray(0),
        opts=RenderOptions(mode="eval", tile_capacity=128, instance_capacity=2 ** 14, interpret=True),
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_colmap_reader_text(tmp_path):
    root = str(tmp_path / "colmap")
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(0)
    H = W = 32
    with open(os.path.join(root, "sparse/0/cameras.txt"), "w") as f:
        f.write("# cams\n1 PINHOLE 32 32 40 40 16 16\n")
    with open(os.path.join(root, "sparse/0/images.txt"), "w") as f:
        for i in range(4):
            cv2.imwrite(
                os.path.join(root, "images", f"img_{i}.png"),
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8),
            )
            f.write(f"{i + 1} 1 0 0 0 {0.2 * i} 0 -3 1 img_{i}.png\n\n")
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    ply_utils.write_points_ply(os.path.join(root, "sparse/0/points3D.ply"), pts, cols)

    cfg = load_config()
    cfg.source_path = root
    cfg.data.type = "Colmap"
    cfg.data.split_test = 4
    from street_gaussians_tpu.runner import build_scene

    scene = build_scene(cfg)
    assert len(scene.train_views) == 3
    assert len(scene.test_views) == 1
    assert scene.table.capacity >= 200


def test_blender_training_end_to_end(tmp_path):
    """training() on a Blender-type scene (background-only, white bg):
    the non-Waymo trainer path the reference equally supports
    (ref: train.py + lib/datasets/blender/blender_readers)."""
    import json

    root = str(tmp_path / "blender")
    _make_blender_dataset(root)
    cfg = load_config()
    cfg.source_path = root
    cfg.model_path = str(tmp_path / "out")
    cfg.trained_model_dir = os.path.join(cfg.model_path, "trained_model")
    cfg.point_cloud_dir = os.path.join(cfg.model_path, "point_cloud")
    cfg.record_dir = os.path.join(cfg.model_path, "record")
    cfg.mode = "train"
    cfg.data.type = "Blender"
    cfg.data.eval = True
    cfg.data.white_background = True
    cfg.optim.densify_until_iter = 0
    cfg.optim.opacity_reset_interval = 10 ** 6
    cfg.train.iterations = 12
    cfg.train.test_iterations = [12]
    cfg.train.save_iterations = []
    cfg.train.checkpoint_iterations = []
    cfg.render.tile_capacity = 128
    cfg.render.instance_capacity = 2 ** 14

    from street_gaussians_tpu.runner import training

    training(cfg, progress=False)
    records = [
        json.loads(l)
        for l in open(os.path.join(cfg.record_dir, "train_log.jsonl"))
    ]
    losses = [r["loss"] for r in records if "loss" in r]
    assert losses and all(np.isfinite(x) for x in losses)
