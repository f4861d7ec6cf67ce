"""Waymo on-disk format loader tests against a synthetic sequence
written in the exact layout the reference converter emits."""

import os

import numpy as np
import pytest

from street_gaussians_tpu.config import load_config
from street_gaussians_tpu.data import waymo
from street_gaussians_tpu.data.dataset import load_ground_truth, load_waymo_scene
from street_gaussians_tpu.data.synthetic_waymo import write_synthetic_waymo


@pytest.fixture(scope="module")
def waymo_dir(tmp_path_factory, module_mocker=None):
    root = tmp_path_factory.mktemp("waymo_seq")
    info = write_synthetic_waymo(str(root), num_frames=4)
    return str(root), info


@pytest.fixture(autouse=True)
def small_sensors(monkeypatch):
    # the synthetic images are 64x96 instead of Waymo's 1280x1920
    monkeypatch.setattr(waymo, "IMAGE_HEIGHTS", [64] * 5)
    monkeypatch.setattr(waymo, "IMAGE_WIDTHS", [96] * 5)


def test_parser_outputs(waymo_dir):
    root, info = waymo_dir
    out = waymo.generate_dataparser_outputs(root, cameras=(0, 1, 2))
    assert out.num_frames == 4
    assert len(out.image_filenames) == 12
    # static object 8 removed, moving object 7 kept
    assert list(out.obj_info.keys()) == [7]
    assert out.obj_info[7]["class"] == "vehicle"
    assert not out.obj_info[7]["deformable"]
    # tracklet array: [F, O, 8] with track ids in column 0
    assert out.obj_tracklets.shape == (4, 1, 8)
    assert (out.obj_tracklets[:, 0, 0] == 7).all()
    # quaternions normalized
    q = out.obj_tracklets[:, 0, 4:8]
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    # background + object point clouds exist
    assert "bkgd" in out.points_xyz_dict
    assert out.points_xyz_dict["bkgd"].shape[0] > 0
    # obj_bounds are per-image full-res masks
    assert len(out.obj_bounds) == 12
    assert out.obj_bounds[0].shape == (64, 96)


def test_val_split():
    train, test = waymo.get_val_frames(8, test_every=4, train_every=None)
    assert test == [4]  # every 4th frame held out
    assert 0 in train and 4 not in train
    train2, test2 = waymo.get_val_frames(8, test_every=None, train_every=1)
    assert train2 == list(range(8)) and test2 == []


def test_load_scene_end_to_end(waymo_dir, tmp_path):
    root, info = waymo_dir
    cfg = load_config()
    cfg.source_path = root
    cfg.model_path = str(tmp_path / "out")
    cfg.mode = "train"
    cfg.data.type = "Waymo"
    cfg.data.split_train = 1
    cfg.data.split_test = -1
    cfg.data.cameras = [0, 1, 2]
    cfg.optim.lambda_sky_scale = [1.0, 1.0, 0.0]

    scene = load_waymo_scene(cfg)
    assert scene.table.names[0] == "background"
    assert "obj_007" in scene.table.names
    assert len(scene.train_views) == 12
    assert len(scene.test_views) == 0

    # ego poses recentred: mean translation ~ 0 across frames
    # scene radius >= 10 floor (waymo_full_readers.py:182)
    assert scene.metadata["scene_radius"] >= 10.0

    # ground truth loads with proper shapes
    v = scene.train_views[0]
    gt = load_ground_truth(v)
    assert gt.image.shape == (v.H, v.W, 3)
    assert gt.sky_mask.shape == (v.H, v.W, 1)
    assert bool(gt.sky_mask.any())
    assert float(gt.lidar_depth.max()) > 0
    assert gt.obj_bound.shape == (v.H, v.W, 1)
    # camera 2 sky scale from lambda_sky_scale list
    cam2 = [w for w in scene.train_views if w.cam == 2][0]
    assert cam2.sky_scale == 0.0

    # input ply artifacts persisted (waymo_utils.py:701-710 analog)
    assert os.path.exists(os.path.join(cfg.model_path, "input_ply/points3D_bkgd.ply"))

    # interp tables cover the actor and give finite ratios
    fi = scene.train_views[5].frame_input
    assert fi.interp is not None
    assert np.isfinite(np.asarray(fi.interp.ratios)).all()


def test_render_loaded_scene(waymo_dir, tmp_path):
    """Smoke: render one view of the loaded scene through the full path."""
    import dataclasses
    import jax.numpy as jnp
    from street_gaussians_tpu.models.renderer import (
        RenderOptions,
        SceneParams,
        render_frame,
    )

    root, info = waymo_dir
    cfg = load_config()
    cfg.source_path = root
    cfg.model_path = str(tmp_path / "out2")
    cfg.data.split_train = 1
    scene = load_waymo_scene(cfg)
    params = SceneParams(
        gaussians=scene.params_init,
        actor_pose=scene.pose_params_init,
        sky=None,
        color_correction=None,
        pose_correction=None,
    )
    opts = RenderOptions(
        mode="eval", tile_capacity=256, instance_capacity=2 ** 15, interpret=True
    )
    v = scene.train_views[0]
    out = render_frame(
        params, scene.aux_init, scene.table, scene.pose_data, v.frame_input,
        step=jnp.asarray(0), opts=opts,
    )
    assert out["rgb"].shape == (v.H, v.W, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert float(out["acc"].max()) > 0.01
