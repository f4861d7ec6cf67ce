"""Multi-device (virtual 8-CPU mesh) data-parallel tests: the driver's
dryrun contract plus DP-vs-single-device gradient equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    n = len(jax.devices())
    assert n >= 8
    ge.dryrun_multichip(8)


def test_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    rgb, depth, acc = jax.block_until_ready(out)
    assert rgb.ndim == 3 and rgb.shape[-1] == 3
    assert np.isfinite(np.asarray(rgb)).all()


def test_dp_matches_single_device_gradients():
    """A DP step on a 2-mesh with both devices seeing the SAME camera must
    equal the single-camera step (pmean of identical grads)."""
    import __graft_entry__ as ge
    from street_gaussians_tpu.config import default_config
    from street_gaussians_tpu.parallel.dp import (
        make_data_parallel_train_step,
        make_mesh,
        stack_frames,
        stack_gts,
    )
    from street_gaussians_tpu import train_lib
    from street_gaussians_tpu.models.renderer import render_frame
    from street_gaussians_tpu.train_lib import GroundTruth, init_train_state

    scene, params, opts = ge._toy_setup(num_actors=1)
    cfg = default_config()
    cfg.optim.lambda_sky = 0.0
    cfg.optim.lambda_reg = 0.0
    cfg.optim.lambda_depth_lidar = 0.0

    view = scene.frames[1]
    H, W = view.cam.H, view.cam.W
    gt_img = render_frame(
        params, scene.aux, scene.table, scene.pose_data, view,
        step=jnp.asarray(0), opts=opts,
    )["rgb"]
    gt = GroundTruth(
        image=gt_img,
        mask=jnp.ones((H, W, 1), bool),
        sky_mask=jnp.zeros((H, W, 1), bool),
        lidar_depth=jnp.zeros((H, W)),
        obj_bound=jnp.zeros((H, W, 1), bool),
        sky_scale=jnp.ones(()),
    )

    # single-device reference step. keys must match the DP path's
    # device-0 key derivation (fold_in(split(key)[0], 0) vs what the
    # single step uses internally) — use eval opts (no randomness).
    state0 = init_train_state(params, scene.aux)
    single_fn = train_lib.make_train_step(
        cfg, scene.table, scene.pose_data, opts, donate=False
    )
    key = jax.random.PRNGKey(7)
    s1, sc1 = single_fn(state0, view, gt, key)

    # DP with 2 devices, both on the same camera
    mesh = make_mesh(2)
    dp_fn = make_data_parallel_train_step(cfg, scene.table, scene.pose_data, opts, mesh)
    state0b = init_train_state(params, scene.aux)
    frames_b = stack_frames([view, view])
    gts_b = stack_gts([gt, gt])
    s2, sc2 = dp_fn(state0b, frames_b, gts_b, key)

    np.testing.assert_allclose(float(sc1["loss"]), float(sc2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params.gaussians.xyz),
        np.asarray(s2.params.gaussians.xyz),
        atol=1e-5,
    )
    # densification stats: DP sums over 2 identical cameras = 2x single
    np.testing.assert_allclose(
        np.asarray(s2.aux.denom), 2.0 * np.asarray(s1.aux.denom), atol=1e-5
    )
