"""Checkpoint + PLY round-trips."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_tpu import checkpoint as ckpt
from street_gaussians_tpu import train_lib
from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models.renderer import SceneParams
from street_gaussians_tpu.models.sky_cubemap import init_sky


@pytest.fixture(scope="module")
def state_and_scene():
    scene = make_synthetic_scene(num_bkgd=150, num_actors=1, H=32, W=48)
    params = SceneParams(
        gaussians=scene.params_init,
        actor_pose=scene.pose_params_init,
        sky=init_sky(16, False),
        color_correction=None,
        pose_correction=None,
    )
    return train_lib.init_train_state(params, scene.aux), scene


def test_orbax_roundtrip(state_and_scene, tmp_path):
    state, scene = state_and_scene
    d = str(tmp_path / "trained_model")
    ckpt.save_train_state(d, 123, state)
    assert ckpt.search_max_iteration(d) == 123
    restored, it = ckpt.load_train_state(d, state)
    assert it == 123
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ply_roundtrip(state_and_scene, tmp_path):
    state, scene = state_and_scene
    path = ckpt.save_point_cloud(
        str(tmp_path / "pc"), 7, state.params.gaussians, state.aux, scene.table
    )
    assert os.path.exists(path)
    # wipe and reload into fresh buffers
    blank = jax.tree.map(jnp.zeros_like, state.params.gaussians)
    params2, aux2 = ckpt.load_point_cloud_into(path, blank, state.aux, scene.table)
    alive = np.asarray(state.aux.alive)
    np.testing.assert_allclose(
        np.asarray(params2.xyz)[alive], np.asarray(state.params.gaussians.xyz)[alive],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params2.feat_dc)[alive],
        np.asarray(state.params.gaussians.feat_dc)[alive],
        atol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(aux2.alive), alive)


def test_resume_continues_training(state_and_scene, tmp_path):
    """Save -> restore -> one more step runs and matches the state shape
    contract (the auto-resume path, ref: train.py:36-47)."""
    state, scene = state_and_scene
    d = str(tmp_path / "resume")
    state = dataclasses.replace(state, step=jnp.asarray(5, jnp.int32))
    ckpt.save_train_state(d, 5, state)
    restored, it = ckpt.load_train_state(d, state)
    assert int(restored.step) == 5
