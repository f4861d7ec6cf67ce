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


def _make_gt(params, scene, view, opts, shift=0.0):
    from street_gaussians_tpu.models.renderer import render_frame
    from street_gaussians_tpu.train_lib import GroundTruth

    H, W = view.cam.H, view.cam.W
    img = render_frame(
        params, scene.aux, scene.table, scene.pose_data, view,
        step=jnp.asarray(0), opts=opts,
    )["rgb"]
    return GroundTruth(
        image=jnp.clip(img + shift, 0.0, 1.0),
        mask=jnp.ones((H, W, 1), bool),
        sky_mask=jnp.zeros((H, W, 1), bool),
        lidar_depth=jnp.zeros((H, W)),
        obj_bound=jnp.zeros((H, W, 1), bool),
        sky_scale=jnp.ones(()),
    )


def test_dp_distinct_cameras_matches_averaged_gradients():
    """DP over 4 DISTINCT cameras must equal one masked-Adam step with
    the per-camera gradients averaged — assembled here from the same
    building blocks (render_frame/compute_losses/make_lr_tree/
    adam_update), catching cross-camera stat-accumulation and
    reduction bugs the same-camera test cannot."""
    import dataclasses

    import __graft_entry__ as ge
    from street_gaussians_tpu.config import default_config
    from street_gaussians_tpu.models.renderer import render_frame
    from street_gaussians_tpu.optim.adam import adam_update
    from street_gaussians_tpu.parallel.dp import (
        make_data_parallel_train_step,
        make_mesh,
        stack_frames,
        stack_gts,
    )
    from street_gaussians_tpu.train_lib import (
        TrainState,
        compute_losses,
        init_train_state,
        make_lr_tree,
    )
    from street_gaussians_tpu.utils import losses as L

    scene, params, opts = ge._toy_setup(num_actors=1)
    cfg = default_config()
    cfg.optim.lambda_sky = 0.0
    cfg.optim.lambda_reg = 0.0
    cfg.optim.lambda_depth_lidar = 0.0

    views = [scene.frames[i] for i in range(4)]
    gts = [_make_gt(params, scene, v, opts, shift=0.05 * i) for i, v in enumerate(views)]

    # ---- manual: per-camera grads -> mean -> one masked-Adam step ----
    # (runs FIRST: the DP step donates its input state, deleting the
    # shared aux arrays)
    table = scene.table
    C = table.capacity
    state0 = init_train_state(params, scene.aux)

    def loss_one(p, view, gt):
        out = render_frame(
            p, state0.aux, table, scene.pose_data, view,
            step=state0.step, key=None, opts=opts,
            mean2d_offset=jnp.zeros((C, 2)), absgrad_dummy=jnp.zeros((C, 2)),
        )
        loss, _ = compute_losses(
            out, None, gt, p, cfg, view.cam.image_id, jnp.asarray(1.0),
            aux=state0.aux, table=table,
        )
        return loss

    # jit to match the DP step's compilation: eager execution rounds the
    # blend kernel's matmul prefix-sums differently, which flips signs
    # of near-zero gradients (Adam then amplifies to full lr steps)
    grads = [jax.jit(jax.grad(loss_one))(params, v, g) for v, g in zip(views, gts)]
    g_mean = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads)

    in_range_any = np.zeros(C, bool)
    for v in views:
        ir = (v.cam.frame >= table.start_frame[state0.aux.model_id]) & (
            v.cam.frame <= table.end_frame[state0.aux.model_id]
        )
        in_range_any |= np.asarray(ir)
    row_mask = state0.aux.alive & jnp.asarray(in_range_any)
    mask_tree = jax.tree.map(lambda _: jnp.ones((), jnp.float32), params)
    mask_tree = dataclasses.replace(
        mask_tree, gaussians=jax.tree.map(lambda _: row_mask, params.gaussians)
    )
    lr_tree = make_lr_tree(cfg, table, params, state0.aux, state0.step)
    new_params, _ = adam_update(params, g_mean, state0.adam, lr_tree, mask_tree)

    key = jax.random.PRNGKey(3)
    mesh = make_mesh(4)
    dp_fn = make_data_parallel_train_step(cfg, scene.table, scene.pose_data, opts, mesh)
    s_dp, sc_dp = dp_fn(
        init_train_state(params, scene.aux), stack_frames(views), stack_gts(gts), key
    )

    # elements whose per-camera gradients nearly cancel in the mean are
    # excluded: the cancelled residual depends on f32 summation order
    # (pmean tree reduction vs manual sum/4), and Adam(eps=1e-15)
    # normalizes any residual to a full-size lr*sign step — a property
    # of the optimizer, not a DP bug
    def compare(dp_leaf, manual_leaf, attr):
        gm = np.abs(np.asarray(getattr(g_mean.gaussians, attr)))
        gmax = np.max(
            [np.abs(np.asarray(getattr(g.gaussians, attr))) for g in grads], axis=0
        )
        # also drop elements whose gradients are degenerate-small for
        # EVERY camera (< 1e-5 of the leaf's largest gradient): kernel
        # reduction-order noise can flip their sign, and Adam's first
        # step turns any sign into a full lr step
        el = (gm > 0.2 * gmax) & (gmax > 1e-5 * gmax.max())
        assert el.sum() > 100, "too few well-conditioned elements"
        a = np.asarray(dp_leaf)[el]
        b = np.asarray(manual_leaf)[el]
        diff = np.abs(a - b)
        # a residual (<=1%) tail of lr*sign flips survives any filter;
        # anything beyond one Adam step of difference is a real bug
        assert (diff > 2e-6).mean() <= 0.01, (
            f"{attr}: {(diff > 2e-6).mean():.2%} elements differ"
        )
        # the DP and manual paths compile differently (shard_map vs
        # plain jit), so the blend kernel's matmul reduction order can
        # differ at an early-termination knife edge — a gaussian just
        # past the trigger gets an exactly-zero gradient in one path
        # and a real one in the other, and Adam's first step turns that
        # into a full lr difference. Tolerate a trace (<=0.1%) of such
        # flips; a real DP bug (wrong mask / missing psum) flips far
        # more.
        flips = diff > 5e-3
        assert flips.mean() <= 1e-3, (
            f"{attr}: {flips.mean():.2%} full-step flips"
        )
        if (~flips).any():
            assert diff[~flips].max() < 5e-3, (
                f"{attr}: max diff {diff[~flips].max()}"
            )

    compare(s_dp.params.gaussians.xyz, new_params.gaussians.xyz, "xyz")
    compare(
        s_dp.params.gaussians.opacity_logit,
        new_params.gaussians.opacity_logit,
        "opacity_logit",
    )


def test_dp_train_mode_deterministic():
    """With train-mode randomness ON (flip augmentation, ray jitter), the
    same state+key must give bit-identical results across runs, and a
    different key must change the outcome."""
    import dataclasses

    import __graft_entry__ as ge
    from street_gaussians_tpu.config import default_config
    from street_gaussians_tpu.parallel.dp import (
        make_data_parallel_train_step,
        make_mesh,
        stack_frames,
        stack_gts,
    )
    from street_gaussians_tpu.train_lib import init_train_state

    scene, params, opts = ge._toy_setup(num_actors=1)
    opts = dataclasses.replace(opts, mode="train")
    cfg = default_config()
    cfg.optim.lambda_sky = 0.05
    cfg.optim.lambda_reg = 0.0
    cfg.optim.lambda_depth_lidar = 0.0

    views = [scene.frames[i] for i in range(2)]
    gts = [_make_gt(params, scene, v, opts, shift=0.1) for v in views]
    frames_b, gts_b = stack_frames(views), stack_gts(gts)

    mesh = make_mesh(2)
    dp_fn = make_data_parallel_train_step(cfg, scene.table, scene.pose_data, opts, mesh)
    key = jax.random.PRNGKey(11)

    def fresh_state():
        # deep copies: the DP step donates its input state buffers
        return init_train_state(
            jax.tree.map(jnp.array, params), jax.tree.map(jnp.array, scene.aux)
        )

    s_a, _ = dp_fn(fresh_state(), frames_b, gts_b, key)
    xyz_a = np.asarray(s_a.params.gaussians.xyz)
    sky_a = np.asarray(s_a.params.sky.cubemap)
    s_b, _ = dp_fn(fresh_state(), frames_b, gts_b, key)
    np.testing.assert_array_equal(xyz_a, np.asarray(s_b.params.gaussians.xyz))

    s_c, _ = dp_fn(fresh_state(), frames_b, gts_b, jax.random.PRNGKey(12))
    assert not np.array_equal(
        sky_a, np.asarray(s_c.params.sky.cubemap)
    )


def test_single_device_multistep_bit_reproducible():
    """20 consecutive train-mode steps from identical state + seed must
    be BIT-identical across two runs — the race-free/deterministic
    claim (no atomics anywhere: scatter-free reductions, stable sorts),
    at the multi-step horizon where a single nondeterministic bit would
    amplify."""
    import dataclasses

    import __graft_entry__ as ge
    from street_gaussians_tpu.config import default_config
    from street_gaussians_tpu.train_lib import init_train_state, make_train_step

    scene, params, opts = ge._toy_setup(num_actors=1)
    opts = dataclasses.replace(opts, mode="train")
    cfg = default_config()
    cfg.optim.lambda_sky = 0.05
    cfg.optim.lambda_depth_lidar = 0.0
    step_fn = make_train_step(cfg, scene.table, scene.pose_data, opts)
    view = scene.frames[0]
    gt = _make_gt(params, scene, view, opts, shift=0.1)

    def run():
        state = init_train_state(
            jax.tree.map(jnp.array, params), jax.tree.map(jnp.array, scene.aux)
        )
        key = jax.random.PRNGKey(7)
        for _ in range(20):
            key, sub = jax.random.split(key)
            state, _ = step_fn(state, view, gt, sub)
        return state

    a, b = run(), run()
    for la, lb in zip(
        jax.tree_util.tree_leaves(a.params), jax.tree_util.tree_leaves(b.params)
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
