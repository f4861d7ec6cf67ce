"""Gaussian-sharded rendering on the virtual CPU mesh: params split
over a 'gauss' axis, screen rows all-gathered — outputs and parameter
gradients must match the single-device render, and the path must
compose with row(tile)-sharding on a 2D mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import __graft_entry__ as ge
from street_gaussians_tpu.models.renderer import render_frame
from street_gaussians_tpu.parallel.gauss import (
    make_gauss_mesh,
    make_gauss_sharded_render,
    shard_params,
)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_gauss_sharded_render_matches_single(n_shards):
    scene, params, opts = ge._toy_setup(num_actors=1)
    assert scene.table.capacity % n_shards == 0
    frame = scene.frames[1]

    single = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts,
    )

    mesh = make_gauss_mesh(n_shards)
    sp, sa = shard_params(params, scene.aux, mesh)
    render = make_gauss_sharded_render(
        scene.table, scene.pose_data, opts, mesh
    )
    sharded = render(sp, sa, frame)

    np.testing.assert_allclose(
        np.asarray(sharded["rgb"]), np.asarray(single["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded["depth"]), np.asarray(single["depth"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(sharded["acc"]), np.asarray(single["acc"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded["radii"]), np.asarray(single["radii"]), atol=1e-4
    )


def test_gauss_sharded_gradients_match_single():
    """Backward: the all_gather transposes to a psum-scatter, so each
    shard's parameter gradient rows must equal the single-device rows."""
    scene, params, opts = ge._toy_setup(num_actors=1)
    frame = scene.frames[1]
    rng = np.random.default_rng(0)
    H, W = frame.cam.H, frame.cam.W
    dl = jnp.asarray(rng.standard_normal((H, W, 3)).astype(np.float32)) * 1e-2

    def loss_single(params):
        out = render_frame(
            params, scene.aux, scene.table, scene.pose_data, frame,
            step=jnp.asarray(10 ** 9), opts=opts,
        )
        return jnp.sum(out["rgb"] * dl)

    mesh = make_gauss_mesh(4)
    render = make_gauss_sharded_render(
        scene.table, scene.pose_data, opts, mesh
    )

    def loss_sharded(params):
        out = render(params, scene.aux, frame)
        return jnp.sum(out["rgb"] * dl)

    v1, v2 = float(loss_single(params)), float(loss_sharded(params))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)

    g1 = jax.grad(loss_single)(params)
    g2 = jax.grad(loss_sharded)(params)
    for name in ("xyz", "log_scale", "opacity_logit", "feat_dc", "feat_rest"):
        a = np.asarray(getattr(g1.gaussians, name))
        b = np.asarray(getattr(g2.gaussians, name))
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b / scale, a / scale, atol=2e-5, err_msg=f"grad mismatch: {name}"
        )
    a = np.asarray(g1.sky.cubemap)
    b = np.asarray(g2.sky.cubemap)
    scale = max(np.abs(a).max(), 1e-8)
    np.testing.assert_allclose(b / scale, a / scale, atol=2e-5)


def test_gauss_sharding_composes_with_tile_sharding():
    """2D mesh (gauss=2, tile=2): params split 2-way, each render band
    split 2-way — output must match single-device."""
    scene, params, opts = ge._toy_setup(num_actors=1)
    frame = scene.frames[2]
    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, axis_names=("gauss", "tile"))

    render = make_gauss_sharded_render(
        scene.table, scene.pose_data, opts, mesh, tile_axis="tile"
    )
    sharded = render(params, scene.aux, frame)

    single = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts,
    )
    np.testing.assert_allclose(
        np.asarray(sharded["rgb"]), np.asarray(single["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded["acc"]), np.asarray(single["acc"]), atol=2e-5
    )


def test_gauss_sharded_object_subset_render_matches_single():
    """include_mask (per-MODEL [M], indexed through the local rows'
    model_id — needs no slicing under sharding) must give the same
    object-only render as the single-device path; this is the
    render.parallel gauss=N + eval_obj_render combination the runner
    wires for trajectory/object renders."""
    from street_gaussians_tpu.models.renderer import render_object_mask

    scene, params, opts = ge._toy_setup(num_actors=1)
    frame = scene.frames[1]
    obj_mask = render_object_mask(scene.table)

    single = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts, include_mask=obj_mask,
    )

    mesh = make_gauss_mesh(4)
    render = make_gauss_sharded_render(
        scene.table, scene.pose_data, opts, mesh, include_mask=obj_mask
    )
    sharded = render(params, scene.aux, frame)

    np.testing.assert_allclose(
        np.asarray(sharded["rgb"]), np.asarray(single["rgb"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded["acc"]), np.asarray(single["acc"]), atol=2e-5
    )
