"""Gaussian-sharded TRAINING (parallel/gauss.py
make_gauss_sharded_train_step): parameters AND Adam moments row-sharded
over a 'gauss' mesh axis — sharded steps must match single-device steps,
compose with camera-DP on a 2D ('data','gauss') mesh, and actually place
the row leaves distributed (the larger-than-chip-HBM story,
docs/memory_model.md). No reference analog — the reference is strictly
single-GPU (lib/utils/cfg_utils.py:9-11)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import __graft_entry__ as ge
from street_gaussians_tpu.config import default_config
from street_gaussians_tpu.models.renderer import render_frame
from street_gaussians_tpu.parallel.gauss import (
    make_gauss_mesh,
    make_gauss_sharded_train_step,
    shard_train_state,
    train_state_specs,
)
from street_gaussians_tpu.train_lib import (
    GroundTruth,
    init_train_state,
    make_train_step,
)


def _fresh(tree):
    """Deep-copy a pytree's buffers: the train steps donate their state,
    and device_put/init share buffers — reusing `params` after a donating
    step would hit deleted arrays."""
    return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)


def _setup(mode="train"):
    scene, params, opts = ge._toy_setup(num_actors=1)
    opts = dataclasses.replace(opts, mode=mode)
    cfg = default_config()
    cfg.optim.lambda_sky = 0.05
    cfg.optim.lambda_depth_lidar = 0.01
    return scene, params, opts, cfg


def _gts(scene, params, opts, views):
    H, W = views[0].cam.H, views[0].cam.W
    rng = np.random.default_rng(0)
    out = []
    for v in views:
        img = render_frame(
            params, scene.aux, scene.table, scene.pose_data, v,
            step=jnp.asarray(0), opts=opts,
        )["rgb"]
        # perturb so gradients are non-trivial everywhere
        img = jnp.clip(
            img + jnp.asarray(rng.normal(0, 0.05, img.shape).astype(np.float32)),
            0.0, 1.0,
        )
        out.append(
            GroundTruth(
                image=jnp.asarray(np.asarray(img)),
                mask=jnp.ones((H, W, 1), bool),
                sky_mask=jnp.zeros((H, W, 1), bool),
                lidar_depth=jnp.full((H, W), 8.0),
                obj_bound=jnp.zeros((H, W, 1), bool),
                sky_scale=jnp.ones(()),
            )
        )
    return out


def _compare_rows(name, a, b, g_ref, atol_tight=2e-6, atol_step=5e-3):
    """DP-parity tolerance model (tests/test_multichip.py:199-233): the
    sharded and single-device paths compile differently, so a trace of
    elements at an early-termination knife edge can get an exactly-zero
    gradient in one path and a real one in the other — Adam(eps=1e-15)
    then turns the sign into a full lr step. Anything beyond a full-step
    difference, or more than a trace of full-step flips, is a real bug."""
    a, b = np.asarray(a), np.asarray(b)
    g = np.abs(np.asarray(g_ref))
    diff = np.abs(a - b)
    flips = diff > atol_step
    assert flips.mean() <= 1e-3, f"{name}: {flips.mean():.2%} full-step flips"
    if g.max() == 0.0:
        # the single-device step did not move this leaf at all — the
        # sharded step must agree exactly
        np.testing.assert_allclose(a, b, atol=atol_tight, err_msg=name)
        return
    sel = (g > max(1e-5 * g.max(), 1e-30)) & ~flips
    if sel.any():
        assert diff[sel].max() <= atol_step, f"{name}: max diff {diff[sel].max()}"
        assert (diff[sel] > atol_tight).mean() <= 0.01, (
            f"{name}: {(diff[sel] > atol_tight).mean():.2%} beyond tight tol"
        )


@pytest.mark.parametrize("n_shards", [2, 4])
def test_gauss_sharded_step_matches_single(n_shards):
    """One sharded step == one single-device step: params, Adam moments,
    and densification statistics."""
    scene, params, opts, cfg = _setup(mode="eval")  # no RNG in render
    assert scene.table.capacity % n_shards == 0
    views = [scene.frames[1]]
    gts = _gts(scene, params, opts, views)

    step_single = make_train_step(
        cfg, scene.table, scene.pose_data, opts, donate=False
    )
    s_ref, sc_ref = step_single(
        init_train_state(params, scene.aux), views[0], gts[0],
        jax.random.PRNGKey(7),
    )
    # reference gradient magnitudes for the knife-edge filter
    delta = jax.tree.map(
        lambda p0, p1: np.asarray(p1) - np.asarray(p0),
        params.gaussians,
        s_ref.params.gaussians,
    )

    mesh = make_gauss_mesh(n_shards)
    step_fn = make_gauss_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh
    )
    s_sh, sc_sh = step_fn(
        shard_train_state(init_train_state(params, scene.aux), mesh),
        views[0], gts[0], jax.random.PRNGKey(7),
    )

    np.testing.assert_allclose(
        float(sc_sh["loss"]), float(sc_ref["loss"]), rtol=1e-5
    )
    for leaf in ("xyz", "log_scale", "rot", "opacity_logit", "feat_dc", "feat_rest"):
        _compare_rows(
            f"params.{leaf}",
            getattr(s_sh.params.gaussians, leaf),
            getattr(s_ref.params.gaussians, leaf),
            getattr(delta, leaf),
        )
        _compare_rows(
            f"adam.mu.{leaf}",
            getattr(s_sh.adam.mu.gaussians, leaf),
            getattr(s_ref.adam.mu.gaussians, leaf),
            getattr(delta, leaf),
            atol_step=1e-2,
        )
    # non-row params: sky grads cross no gather (psum/D calibration)
    np.testing.assert_allclose(
        np.asarray(s_sh.params.sky.cubemap),
        np.asarray(s_ref.params.sky.cubemap),
        atol=5e-6,
    )
    if s_ref.params.actor_pose is not None:
        np.testing.assert_allclose(
            np.asarray(s_sh.params.actor_pose.opt_trans),
            np.asarray(s_ref.params.actor_pose.opt_trans),
            atol=5e-3,  # Adam first step ~ lr; trans lr 5e-4
        )
    # densification statistics live on the sharded aux rows
    np.testing.assert_allclose(
        np.asarray(s_sh.aux.denom), np.asarray(s_ref.aux.denom), atol=0
    )
    _compare_rows(
        "aux.grad_accum", s_sh.aux.grad_accum, s_ref.aux.grad_accum,
        np.asarray(s_ref.aux.grad_accum), atol_step=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(s_sh.aux.max_radii), np.asarray(s_ref.aux.max_radii),
        atol=1e-4,
    )


def test_gauss_sharded_multi_step_loss_trajectory():
    """Five sharded steps track five single-device steps' losses — the
    integrated check that Adam + stats stay consistent over time."""
    scene, params, opts, cfg = _setup(mode="eval")
    views = [scene.frames[i % len(scene.frames)] for i in range(5)]
    gts = _gts(scene, params, opts, views)

    step_single = make_train_step(
        cfg, scene.table, scene.pose_data, opts, donate=False
    )
    s = init_train_state(params, scene.aux)
    losses_ref = []
    for v, g in zip(views, gts):
        s, sc = step_single(s, v, g, jax.random.PRNGKey(int(s.step)))
        losses_ref.append(float(sc["loss"]))

    mesh = make_gauss_mesh(4)
    step_fn = make_gauss_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh
    )
    s = shard_train_state(init_train_state(params, scene.aux), mesh)
    losses_sh = []
    for v, g in zip(views, gts):
        s, sc = step_fn(s, v, g, jax.random.PRNGKey(int(s.step)))
        losses_sh.append(float(sc["loss"]))

    np.testing.assert_allclose(losses_sh, losses_ref, rtol=2e-3)
    assert losses_ref[-1] < losses_ref[0]  # it actually optimizes


def test_gauss_sharded_composes_with_camera_dp():
    """2D ('data','gauss') mesh: a 2-camera batch with 2 row shards per
    camera must match the camera-DP step (replicated rows) on the same
    batch."""
    from street_gaussians_tpu.parallel.dp import (
        make_data_parallel_train_step,
        make_mesh,
        stack_frames,
        stack_gts,
    )

    scene, params, opts, cfg = _setup(mode="eval")
    views = [scene.frames[1], scene.frames[2]]
    gts = _gts(scene, params, opts, views)
    frames_b = stack_frames(views)
    gts_b = stack_gts(gts)

    dp_fn = make_data_parallel_train_step(
        cfg, scene.table, scene.pose_data, opts, make_mesh(2)
    )
    s_dp, sc_dp = dp_fn(
        init_train_state(_fresh(params), _fresh(scene.aux)), frames_b, gts_b,
        jax.random.PRNGKey(0),
    )
    delta = jax.tree.map(
        lambda p0, p1: np.asarray(p1) - np.asarray(p0),
        params.gaussians,
        s_dp.params.gaussians,
    )

    mesh = Mesh(
        np.array(jax.devices()[:4]).reshape(2, 2), ("data", "gauss")
    )
    step_fn = make_gauss_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh, data_axis="data"
    )
    s_2d, sc_2d = step_fn(
        shard_train_state(
            init_train_state(_fresh(params), _fresh(scene.aux)), mesh
        ),
        frames_b, gts_b, jax.random.PRNGKey(0),
    )

    np.testing.assert_allclose(
        float(sc_2d["loss"]), float(sc_dp["loss"]), rtol=1e-5
    )
    for leaf in ("xyz", "opacity_logit", "feat_dc"):
        _compare_rows(
            f"2d.params.{leaf}",
            getattr(s_2d.params.gaussians, leaf),
            getattr(s_dp.params.gaussians, leaf),
            getattr(delta, leaf),
        )
    np.testing.assert_allclose(
        np.asarray(s_2d.aux.denom), np.asarray(s_dp.aux.denom), atol=0
    )


def test_gauss_sharded_state_is_actually_distributed():
    """The memory claim: every row leaf (params, BOTH Adam moments, the
    per-row step counts, aux) is placed with C/N rows per device."""
    scene, params, opts, cfg = _setup()
    C = scene.table.capacity
    mesh = make_gauss_mesh(4)
    state = shard_train_state(init_train_state(params, scene.aux), mesh)

    def rows(x):
        return x.addressable_shards[0].data.shape[0]

    for leaf in ("xyz", "feat_rest", "opacity_logit"):
        assert rows(getattr(state.params.gaussians, leaf)) == C // 4
        assert rows(getattr(state.adam.mu.gaussians, leaf)) == C // 4
        assert rows(getattr(state.adam.nu.gaussians, leaf)) == C // 4
        assert rows(getattr(state.adam.count.gaussians, leaf)) == C // 4
    assert rows(state.aux.alive) == C // 4
    assert rows(state.aux.grad_accum) == C // 4
    # replicated leaves stay replicated
    assert state.params.sky.cubemap.addressable_shards[0].data.shape == (
        state.params.sky.cubemap.shape
    )

    # one step preserves the placement (out_specs round-trip)
    gts = _gts(scene, params, dataclasses.replace(opts, mode="eval"),
               [scene.frames[1]])
    step_fn = make_gauss_sharded_train_step(
        cfg, scene.table, scene.pose_data,
        dataclasses.replace(opts, mode="eval"), mesh,
    )
    state, _ = step_fn(state, scene.frames[1], gts[0], jax.random.PRNGKey(0))
    assert rows(state.params.gaussians.feat_rest) == C // 4
    assert rows(state.adam.nu.gaussians.feat_rest) == C // 4


def test_gauss_sharded_rejects_row_reducing_regularizers():
    scene, params, opts, cfg = _setup()
    cfg.optim.lambda_scale_flatten = 0.1
    with pytest.raises(NotImplementedError):
        make_gauss_sharded_train_step(
            cfg, scene.table, scene.pose_data, opts, make_gauss_mesh(2)
        )
