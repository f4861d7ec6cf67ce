"""Tile-sharded TRAINING (parallel/tiles.py make_tile_sharded_train_step):
every train-step render's binning + Pallas blend forward AND backward
split over tile-row bands — the per-iteration-latency scaling axis.
Sharded steps must match single-device steps and compose with camera-DP
on a 2D ('data','tile') mesh. No reference analog — the reference is
strictly single-GPU (lib/utils/cfg_utils.py:9-11)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import __graft_entry__ as ge
from street_gaussians_tpu.config import default_config
from street_gaussians_tpu.models.renderer import render_frame
from street_gaussians_tpu.parallel.tiles import (
    make_tile_mesh,
    make_tile_sharded_train_step,
)
from street_gaussians_tpu.train_lib import (
    GroundTruth,
    init_train_state,
    make_train_step,
)
from tests.test_gauss_train import _compare_rows, _fresh


def _setup(mode="eval", H=64, W=48):
    # H=64 -> 4 tile rows, so a 4-way tile mesh gives one row per band
    scene, params, opts = ge._toy_setup(H=H, W=W, num_actors=1)
    opts = dataclasses.replace(opts, mode=mode)
    cfg = default_config()
    cfg.optim.lambda_sky = 0.05
    cfg.optim.lambda_depth_lidar = 0.01
    return scene, params, opts, cfg


def _gts(scene, params, opts, views, seed=0):
    H, W = views[0].cam.H, views[0].cam.W
    rng = np.random.default_rng(seed)
    eval_opts = dataclasses.replace(opts, mode="eval")
    out = []
    for v in views:
        img = render_frame(
            params, scene.aux, scene.table, scene.pose_data, v,
            step=jnp.asarray(0), opts=eval_opts,
        )["rgb"]
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


def _compare_sky(s_sh, s_ref, lr=0.01):
    """Sky cubemap after one step. Raw band-split gradients match the
    single-device ones to ~1e-6 rel (measured) with zero sign flips on
    SAMPLED texels — but a texel no ray hits gets gradient exactly-0 in
    one compilation and ~1e-12 in the other, and Adam(eps=1e-15) turns
    that into a full ±lr step. Sampled texels must match tightly;
    unsampled ones may differ by up to a full first step."""
    a = np.asarray(s_sh.params.sky.cubemap)
    b = np.asarray(s_ref.params.sky.cubemap)
    g = np.asarray(s_ref.adam.mu.sky.cubemap) / 0.1
    sig = np.abs(g) > max(1e-4 * np.abs(g).max(), 1e-12)
    diff = np.abs(a - b)
    assert diff.max() <= 2.2 * lr, f"sky: diff {diff.max()} beyond a full step"
    np.testing.assert_allclose(a[sig], b[sig], atol=5e-6, err_msg="sky sampled")


def _compare_leaf(name, s_sh, s_ref, leaf):
    """Compare one packed-gaussian leaf after the step.

    The single-device/sharded tolerance model (_compare_rows) filters on
    gradient MAGNITUDE — but the post-Adam delta is lr*sign(g) at step 1
    regardless of |g|, so it cannot detect a degenerate leaf. The raw
    gradient is recovered from the first Adam step's mu (= 0.1*g): a
    leaf whose whole gradient is ~0 (the toy scene's `rot` measures
    |g|max ~ 4e-12) gets pure reassociation-noise SIGNS, and the two
    paths' Adam moves are ±lr noise — only the mu magnitudes are
    comparable there."""
    g = np.asarray(getattr(s_ref.adam.mu.gaussians, leaf)) / 0.1
    if np.abs(g).max() < 1e-9:
        np.testing.assert_allclose(
            np.asarray(getattr(s_sh.adam.mu.gaussians, leaf)),
            np.asarray(getattr(s_ref.adam.mu.gaussians, leaf)),
            atol=1e-9, err_msg=f"degenerate-leaf mu {name}",
        )
        return
    _compare_rows(
        f"params.{leaf}",
        getattr(s_sh.params.gaussians, leaf),
        getattr(s_ref.params.gaussians, leaf),
        g,
    )
    _compare_rows(
        f"adam.mu.{leaf}",
        getattr(s_sh.adam.mu.gaussians, leaf),
        getattr(s_ref.adam.mu.gaussians, leaf),
        g,
        atol_step=1e-2,
    )


@pytest.mark.parametrize("n_shards", [2, 4])
def test_tile_sharded_step_matches_single(n_shards):
    """One tile-sharded step == one single-device step: params, Adam
    moments, and densification statistics (band contributions psum to
    the exact per-gaussian gradients)."""
    scene, params, opts, cfg = _setup(mode="eval")
    views = [scene.frames[1]]
    gts = _gts(scene, params, opts, views)

    step_single = make_train_step(
        cfg, scene.table, scene.pose_data, opts, donate=False
    )
    s_ref, sc_ref = step_single(
        init_train_state(params, scene.aux), views[0], gts[0],
        jax.random.PRNGKey(7),
    )

    mesh = make_tile_mesh(n_shards)
    step_fn = make_tile_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh
    )
    s_sh, sc_sh = step_fn(
        init_train_state(_fresh(params), _fresh(scene.aux)),
        views[0], gts[0], jax.random.PRNGKey(7),
    )

    np.testing.assert_allclose(
        float(sc_sh["loss"]), float(sc_ref["loss"]), rtol=1e-5
    )
    for leaf in ("xyz", "log_scale", "rot", "opacity_logit", "feat_dc", "feat_rest"):
        _compare_leaf(f"[{n_shards}] {leaf}", s_sh, s_ref, leaf)
    # replicated non-row params: sky + actor pose go through the same
    # psum calibration
    _compare_sky(s_sh, s_ref)
    if s_ref.params.actor_pose is not None:
        np.testing.assert_allclose(
            np.asarray(s_sh.params.actor_pose.opt_trans),
            np.asarray(s_ref.params.actor_pose.opt_trans),
            atol=5e-3,
        )
    # densification statistics: radii pmax + psum'd viewspace grads
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


def test_tile_sharded_train_mode_rng_matches_single():
    """mode='train' draws sky-ray jitter + flip augmentation from the
    step key; the sharded step slices the SAME full-image jitter per
    band, so train-mode randomness matches the single-device step."""
    scene, params, opts, cfg = _setup(mode="train")
    views = [scene.frames[1]]
    gts = _gts(scene, params, opts, views)

    step_single = make_train_step(
        cfg, scene.table, scene.pose_data, opts, donate=False
    )
    s_ref, sc_ref = step_single(
        init_train_state(params, scene.aux), views[0], gts[0],
        jax.random.PRNGKey(3),
    )

    step_fn = make_tile_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, make_tile_mesh(4)
    )
    s_sh, sc_sh = step_fn(
        init_train_state(_fresh(params), _fresh(scene.aux)),
        views[0], gts[0], jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(
        float(sc_sh["loss"]), float(sc_ref["loss"]), rtol=1e-5
    )
    _compare_leaf("train-mode xyz", s_sh, s_ref, "xyz")
    _compare_sky(s_sh, s_ref)


def test_tile_sharded_multi_step_loss_trajectory():
    """Five tile-sharded steps track five single-device steps' losses."""
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

    step_fn = make_tile_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, make_tile_mesh(4)
    )
    s = init_train_state(_fresh(params), _fresh(scene.aux))
    losses_sh = []
    for v, g in zip(views, gts):
        s, sc = step_fn(s, v, g, jax.random.PRNGKey(int(s.step)))
        losses_sh.append(float(sc["loss"]))

    np.testing.assert_allclose(losses_sh, losses_ref, rtol=2e-3)
    assert losses_ref[-1] < losses_ref[0]


def test_tile_sharded_20step_integration_gate():
    """Fixed-seed 20-step integration gate: the tile-sharded trajectory's
    FINAL loss and PSNR must match the single-device trajectory with no
    per-leaf filtering — the unconditional complement to the tolerance-
    model comparisons above, so any future gradient-calibration
    regression in parallel/tiles.py is unmissable."""
    scene, params, opts, cfg = _setup(mode="eval")
    views = [scene.frames[i % len(scene.frames)] for i in range(20)]
    gts = _gts(scene, params, opts, views)

    step_single = make_train_step(
        cfg, scene.table, scene.pose_data, opts, donate=False
    )
    s = init_train_state(params, scene.aux)
    for v, g in zip(views, gts):
        s, sc_ref = step_single(s, v, g, jax.random.PRNGKey(int(s.step)))

    step_fn = make_tile_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, make_tile_mesh(4)
    )
    s = init_train_state(_fresh(params), _fresh(scene.aux))
    for v, g in zip(views, gts):
        s, sc_sh = step_fn(s, v, g, jax.random.PRNGKey(int(s.step)))

    np.testing.assert_allclose(
        float(sc_sh["loss"]), float(sc_ref["loss"]), rtol=2e-3
    )
    assert abs(float(sc_sh["psnr"]) - float(sc_ref["psnr"])) <= 0.05, (
        f"20-step PSNR drifted: sharded {float(sc_sh['psnr']):.4f} vs "
        f"single {float(sc_ref['psnr']):.4f}"
    )


def test_tile_sharded_composes_with_camera_dp():
    """2D ('data','tile') mesh: a 2-camera batch, each camera's render
    split over 2 tile bands, must match the camera-DP step on the same
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

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "tile"))
    step_fn = make_tile_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh, data_axis="data"
    )
    s_2d, sc_2d = step_fn(
        init_train_state(_fresh(params), _fresh(scene.aux)),
        frames_b, gts_b, jax.random.PRNGKey(0),
    )

    np.testing.assert_allclose(
        float(sc_2d["loss"]), float(sc_dp["loss"]), rtol=1e-5
    )
    for leaf in ("xyz", "opacity_logit", "feat_dc"):
        _compare_leaf(f"2d.{leaf}", s_2d, s_dp, leaf)
    np.testing.assert_allclose(
        np.asarray(s_2d.aux.denom), np.asarray(s_dp.aux.denom), atol=0
    )


def test_tile_sharded_obj_loss_pass():
    """lambda_reg > 0 adds the banded object-subset render; the step must
    still run and move parameters (the obj entropy gate opens only after
    densify_until_iter, so just exercise the graph)."""
    scene, params, opts, cfg = _setup(mode="eval")
    cfg.optim.lambda_reg = 0.1
    views = [scene.frames[1]]
    gts = _gts(scene, params, opts, views)
    step_fn = make_tile_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, make_tile_mesh(2)
    )
    s, sc = step_fn(
        init_train_state(_fresh(params), _fresh(scene.aux)),
        views[0], gts[0], jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(sc["loss"]))
    assert "obj_acc_loss" in sc
