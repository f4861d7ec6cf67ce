"""Gauss x tile TRAIN composition (parallel/gauss.py
make_gauss_sharded_train_step(tile_axis=...)): parameters + Adam moments
row-sharded over 'gauss' AND each device binning/blending only its band
of tile rows — the larger-than-HBM-scene-at-low-latency case (SURVEY.md
§2.6; VERDICT r4 item 4). Sharded steps must match single-device steps
under the documented tolerance models. No reference analog — the
reference is strictly single-GPU (lib/utils/cfg_utils.py:9-11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from street_gaussians_tpu.parallel.gauss import (
    make_gauss_sharded_train_step,
    shard_train_state,
)
from street_gaussians_tpu.train_lib import init_train_state, make_train_step
from tests.test_gauss_train import _compare_rows, _fresh
from tests.test_tile_train import _compare_leaf, _compare_sky, _gts, _setup


def _mesh2d(dg, dt):
    devs = np.array(jax.devices()[: dg * dt]).reshape(dg, dt)
    return Mesh(devs, ("gauss", "tile"))


@pytest.mark.parametrize("dg,dt", [(2, 2), (4, 2)])
def test_gauss_tile_step_matches_single(dg, dt):
    """One (gauss x tile)-sharded step == one single-device step: params,
    Adam moments, densification statistics, replicated leaves."""
    scene, params, opts, cfg = _setup(mode="eval")
    assert scene.table.capacity % dg == 0
    views = [scene.frames[1]]
    gts = _gts(scene, params, opts, views)

    step_single = make_train_step(
        cfg, scene.table, scene.pose_data, opts, donate=False
    )
    s_ref, sc_ref = step_single(
        init_train_state(params, scene.aux), views[0], gts[0],
        jax.random.PRNGKey(7),
    )

    mesh = _mesh2d(dg, dt)
    step_fn = make_gauss_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh, tile_axis="tile"
    )
    s_sh, sc_sh = step_fn(
        shard_train_state(
            init_train_state(_fresh(params), _fresh(scene.aux)), mesh
        ),
        views[0], gts[0], jax.random.PRNGKey(7),
    )

    np.testing.assert_allclose(
        float(sc_sh["loss"]), float(sc_ref["loss"]), rtol=1e-5
    )
    for leaf in ("xyz", "log_scale", "rot", "opacity_logit", "feat_dc", "feat_rest"):
        _compare_leaf(f"[{dg}x{dt}] {leaf}", s_sh, s_ref, leaf)
    _compare_sky(s_sh, s_ref)
    if s_ref.params.actor_pose is not None:
        np.testing.assert_allclose(
            np.asarray(s_sh.params.actor_pose.opt_trans),
            np.asarray(s_ref.params.actor_pose.opt_trans),
            atol=5e-3,
        )
    # densification statistics: radii pmax'd over bands, sliced to local
    # rows, then reassembled by the sharded state's row layout
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


def test_gauss_tile_train_mode_rng_matches_single():
    """mode='train': the band-sliced full-image sky jitter + flip draws
    must reproduce the single-device step's randomness exactly."""
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

    mesh = _mesh2d(2, 2)
    step_fn = make_gauss_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh, tile_axis="tile"
    )
    s_sh, sc_sh = step_fn(
        shard_train_state(
            init_train_state(_fresh(params), _fresh(scene.aux)), mesh
        ),
        views[0], gts[0], jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(
        float(sc_sh["loss"]), float(sc_ref["loss"]), rtol=1e-5
    )
    _compare_leaf("train-mode xyz", s_sh, s_ref, "xyz")
    _compare_sky(s_sh, s_ref)


def test_gauss_tile_multi_step_loss_trajectory():
    """Five composed steps track five single-device steps' losses."""
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

    mesh = _mesh2d(2, 2)
    step_fn = make_gauss_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh, tile_axis="tile"
    )
    s = shard_train_state(
        init_train_state(_fresh(params), _fresh(scene.aux)), mesh
    )
    losses_sh = []
    for v, g in zip(views, gts):
        s, sc = step_fn(s, v, g, jax.random.PRNGKey(int(s.step)))
        losses_sh.append(float(sc["loss"]))

    np.testing.assert_allclose(losses_sh, losses_ref, rtol=2e-3)
    assert losses_ref[-1] < losses_ref[0]


def test_gauss_tile_obj_loss_pass():
    """lambda_reg > 0 adds the band-restricted object-subset render; the
    composed step must still run and produce finite scalars."""
    scene, params, opts, cfg = _setup(mode="eval")
    cfg.optim.lambda_reg = 0.1
    views = [scene.frames[1]]
    gts = _gts(scene, params, opts, views)
    mesh = _mesh2d(2, 2)
    step_fn = make_gauss_sharded_train_step(
        cfg, scene.table, scene.pose_data, opts, mesh, tile_axis="tile"
    )
    s, sc = step_fn(
        shard_train_state(
            init_train_state(_fresh(params), _fresh(scene.aux)), mesh
        ),
        views[0], gts[0], jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(sc["loss"]))
    assert "obj_acc_loss" in sc
