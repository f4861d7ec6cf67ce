"""Gaussian-sharded rendering: the packed Gaussian buffer split across
the mesh's 'gauss' axis.

No reference analog — the CUDA renderer is single-GPU (SURVEY.md §2.6);
this is the TPU-native path for scenes whose Gaussian population (and
its Adam state) exceeds one chip's HBM, and for parallelizing the
per-Gaussian work (actor transforms, SH evaluation, EWA projection).

Scheme: every per-row leaf (params.gaussians, aux, mean2d_offset) is
sharded over 'gauss' along dim 0; each device runs compose + preprocess
(renderer.screen_space) on its C/D rows only, then the SCREEN rows —
an order of magnitude smaller than the parameters once SH coefficients
are folded into a view-dependent rgb — are re-assembled with one
`all_gather` over ICI and the binning + Pallas blend run replicated.
The backward is the transpose: shard_map turns the all_gather's VJP
into a psum-scatter, so each device receives exactly its rows' screen
gradients and runs the per-Gaussian backward shard-local. Parameter
gradients come out sharded — ready for a sharded Adam update.

Composable with row(tile)-sharding on a 2D ('gauss', 'tile') mesh: the
gathered screen rows feed a per-device tile band instead of the full
image (see tests/test_gauss_shard.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from street_gaussians_tpu.models import gaussians as G
from street_gaussians_tpu.models.actor_pose import ActorPoseData
from street_gaussians_tpu.models.renderer import (
    RenderOptions,
    render_frame,
    render_object_mask,
    screen_space,
)


def make_gauss_mesh(n_gauss: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_gauss or len(devices)
    return Mesh(np.array(devices[:n]), axis_names=("gauss",))


def _row_specs(params, aux, axis):
    """PartitionSpecs: gaussian rows sharded over `axis`, rest replicated."""
    p_specs = jax.tree.map(lambda _: P(), params)
    p_specs = dataclasses.replace(
        p_specs,
        gaussians=jax.tree.map(lambda _: P(axis), params.gaussians),
    )
    a_specs = jax.tree.map(lambda _: P(axis), aux)
    return p_specs, a_specs


def shard_params(params, aux, mesh, axis: str = "gauss"):
    """Place the per-row leaves sharded over `axis` (dim 0), the rest
    replicated. Use before the render so the buffers actually live
    distributed; capacity must divide the axis size."""
    p_specs, a_specs = _row_specs(params, aux, axis)
    dev = lambda s: jax.sharding.NamedSharding(mesh, s)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, dev(s)), params, p_specs
    )
    aux = jax.tree.map(lambda x, s: jax.device_put(x, dev(s)), aux, a_specs)
    return params, aux


def make_gauss_sharded_render(
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    opts: RenderOptions,
    mesh: Mesh,
    axis: str = "gauss",
    tile_axis: Optional[str] = None,
    include_mask=None,
):
    """Returns jitted render(params, aux, frame_inp, key) -> out dict.

    params.gaussians / aux rows must be sharded over `axis` (or at least
    divisible by it — shard_map slices them). With `tile_axis` set (2D
    mesh), each device additionally renders only its band of tile rows
    and the image is re-assembled over that axis (parallel/tiles.py
    scheme on the gathered screen rows).
    """
    D = mesh.shape[axis]
    local_opts = opts
    if tile_axis is not None:
        Dt = mesh.shape[tile_axis]
        local_opts = dataclasses.replace(
            opts,
            instance_capacity=max(
                (opts.instance_capacity // Dt + 127) // 128 * 128, 1024
            ),
        )

    def render_local(params, aux, frame_inp, key):
        assert table.capacity % D == 0, (table.capacity, D)
        cam = frame_inp.cam
        screen, composed = screen_space(
            params, aux, table, pose_data, frame_inp,
            step=jnp.asarray(10 ** 9), include_mask=include_mask, key=key,
            opts=local_opts,
        )
        # ---- re-assemble the full screen-space rows over ICI ----
        gather = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
        screen_full = jax.tree.map(gather, screen)
        composed_full = dict(composed)
        for k in ("normals", "semantic"):
            if composed_full.get(k) is not None:
                composed_full[k] = gather(composed_full[k])

        row_shard = None
        if tile_axis is not None:
            gy = (cam.H + 15) // 16
            gy_local = (gy + mesh.shape[tile_axis] - 1) // mesh.shape[tile_axis]
            d = jax.lax.axis_index(tile_axis)
            row_shard = (d * gy_local, gy_local)

        out = render_frame(
            params, aux, table, pose_data, frame_inp,
            step=jnp.asarray(10 ** 9), include_mask=include_mask, key=key,
            opts=local_opts, row_shard=row_shard,
            screen_composed=(screen_full, composed_full),
        )
        if tile_axis is not None:
            def gather_rows(x):
                g = jax.lax.all_gather(x, tile_axis, axis=0, tiled=True)
                return g[: cam.H]

            for k in ("rgb", "acc", "depth", "T", "normals", "semantic"):
                if k in out:
                    out[k] = gather_rows(out[k])
            out["radii"] = jax.lax.pmax(out["radii"], tile_axis)
            out["visibility"] = out["radii"] > 0
            for k in ("overflow", "overflow_instance", "overflow_tile"):
                if k in out:
                    out[k] = jax.lax.psum(out[k], tile_axis)
            out["num_instances"] = jax.lax.psum(out["num_instances"], tile_axis)
        return out

    @jax.jit
    def render(params, aux, frame_inp, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        # specs built from the actual pytree structure (None-leaf
        # subtrees like a missing sky model drop out of tree.map)
        p_specs, a_specs = _row_specs(params, aux, axis)
        fn = jax.shard_map(
            render_local,
            mesh=mesh,
            in_specs=(p_specs, a_specs, P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return fn(params, aux, frame_inp, key)

    return render

# ---------------------------------------------------------------------------
# Gaussian-sharded TRAINING: sharded parameters AND sharded Adam state.
#
# This is the capability the sharded renderer above exists for (its own
# docstring: gradients come out "ready for a sharded Adam update") — a
# scene whose Gaussian population + Adam moments exceed one chip's HBM
# can now be TRAINED, not just rendered. No reference analog (the
# reference is single-GPU, lib/utils/cfg_utils.py:9-11); SURVEY.md §2.6
# plan item (c), §7 step 7.
#
# Memory model (docs/memory_model.md): with every per-row leaf (params,
# two Adam moments, per-row step counts, densification stats) sharded
# over D chips, per-chip HBM for the Gaussian state drops to ~1/D; the
# replicated remainder (screen rows after the all_gather, the image,
# the sky cubemap) is an order of magnitude smaller than the SH
# coefficient tables that dominate the parameter pytree.
#
# Gradient calibration inside shard_map (check_vma=False = manual
# replication bookkeeping): every device computes the SAME full-image
# loss from the gathered screen rows, so we differentiate loss/D.
#   * row-sharded leaves (params.gaussians, the local mean2d offset):
#     the all_gather transposes to a psum-scatter that SUMS the D
#     identical cotangents — the 1/D cancels it exactly; grads exact.
#   * replicated leaves (sky, color correction: paths that never cross
#     the gather) and partial leaves (actor pose, pose correction:
#     paths through the local rows only): one psum over the axis makes
#     both exact — D copies of true/D, or the sum of per-shard row
#     contributions.
#   * the full-row absgrad dummy lives on the gathered side, so its
#     cotangent is true/D replicated: slice the local rows and scale by
#     D.
# ---------------------------------------------------------------------------


def train_state_specs(state, axis: str = "gauss"):
    """PartitionSpec pytree for a TrainState: every per-row leaf
    (params.gaussians, both Adam moments + their per-row step counts,
    aux) sharded over `axis` along dim 0, everything else replicated."""
    from street_gaussians_tpu.optim.adam import AdamState

    p_specs, a_specs = _row_specs(state.params, state.aux, axis)
    return type(state)(
        params=p_specs,
        # mu/nu/count mirror params' tree structure leaf-for-leaf
        adam=AdamState(mu=p_specs, nu=p_specs, count=p_specs),
        aux=a_specs,
        step=P(),
    )


def shard_train_state(state, mesh: Mesh, axis: str = "gauss"):
    """Place a TrainState with the row leaves actually distributed over
    the mesh (use after init / restore / densify so the per-chip HBM
    for a capacity-C scene is ~C/D).

    Works on multi-process meshes too (rows sharded ACROSS hosts — the
    largest-scene story): a host-local/replicated leaf becomes a global
    array via make_array_from_callback (every process holds the full
    value after runner's broadcast-from-0, so each serves its own
    shards); a leaf that is already a non-addressable global array
    (densify output) is resharded with device_put."""
    specs = train_state_specs(state, axis)
    dev = lambda s: jax.sharding.NamedSharding(mesh, s)
    multiproc = jax.process_count() > 1 and len(
        set(d.process_index for d in mesh.devices.flat)
    ) > 1

    def place(x, s):
        sh = dev(s)
        if multiproc and not (
            isinstance(x, jax.Array) and not x.is_fully_addressable
        ):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sh, lambda idx: arr[idx]
            )
        return jax.device_put(x, sh)

    return jax.tree.map(place, state, specs)


def _sharded_render(
    params, aux, table, pose_data, frame_inp, key, opts, axis, step,
    include_mask=None, mean2d_offset=None, absgrad_dummy=None,
    compose_sky=True, row_shard=None, sky_jitter=None,
):
    """Shard-local compose+preprocess, all_gather of the screen rows,
    replicated binning+blend (the train-path twin of render_local in
    make_gauss_sharded_render; include_mask is per-MODEL [M] and is
    indexed through the local rows' model_id, so it needs no slicing).
    With row_shard set (2D gauss x tile mesh) the binning + blend runs
    on only that band of tile rows of the GATHERED screen rows."""
    screen, composed = screen_space(
        params, aux, table, pose_data, frame_inp,
        step=step, include_mask=include_mask, key=key, opts=opts,
        mean2d_offset=mean2d_offset,
    )
    gather = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
    screen_full = jax.tree.map(gather, screen)
    composed_full = dict(composed)
    for k in ("normals", "semantic"):
        if composed_full.get(k) is not None:
            composed_full[k] = gather(composed_full[k])
    return render_frame(
        params, aux, table, pose_data, frame_inp,
        step=step, include_mask=include_mask, key=key, opts=opts,
        compose_sky=compose_sky, absgrad_dummy=absgrad_dummy,
        row_shard=row_shard, sky_jitter=sky_jitter,
        screen_composed=(screen_full, composed_full),
    )


def make_gauss_sharded_train_step(
    cfg,
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    opts: RenderOptions,
    mesh: Mesh,
    axis: str = "gauss",
    data_axis: Optional[str] = None,
    tile_axis: Optional[str] = None,
):
    """Build the jitted Gaussian-sharded train step.

    1D mesh (data_axis=None): step_fn(state, frame_inp, gt, key) — one
    camera per step, the Gaussian rows + Adam state split over `axis`.
    2D mesh (data_axis='data'): step_fn(state, frames_b, gts_b, key)
    with leading batch dim = mesh.shape[data_axis] — camera-DP composed
    with gauss-sharding (gradients pmean over cameras as in
    parallel/dp.py, rows stay sharded).
    2D mesh (tile_axis='tile'): gauss x tile composition — rows + Adam
    state sharded over `axis` (HBM relief at Dg-way), AND each device
    bins + blends only its band of tile rows of the gathered screen
    rows (latency relief at Dt-way; the larger-than-HBM scene at low
    latency, SURVEY.md §2.6). Calibration: every device computes the
    same full-image loss from band images gathered over `tile`, so we
    differentiate loss/(Dg*Dt); the tile gather's psum-scatter VJP
    leaves each band its true pixel cotangent scaled 1/Dg, the gauss
    gather's VJP then sums the Dg identical band-screen cotangents
    (cancelling the 1/Dg), so local-row gradients come out as exact
    per-band contributions — one psum over `tile` reconstructs the
    exact row gradient; replicated leaves (sky etc.) psum over BOTH
    axes.

    State must be placed by shard_train_state (or at least be divisible
    — shard_map slices). N sharded steps match single-device steps
    (tests/test_gauss_train.py, tests/test_gauss_tile_train.py,
    tolerances documented there).
    """
    import dataclasses as _dc

    from street_gaussians_tpu.optim.adam import adam_update
    from street_gaussians_tpu.train_lib import (
        TrainState,
        compute_losses,
        make_lr_tree,
    )
    from street_gaussians_tpu.utils import losses as L

    o = cfg.optim
    C = table.capacity
    Dg = mesh.shape[axis]
    assert C % Dg == 0, (
        f"capacity {C} must divide the '{axis}' axis size {Dg} "
        f"(pad the scene capacity)"
    )
    Cl = C // Dg
    Dt = mesh.shape[tile_axis] if tile_axis is not None else 1
    if tile_axis is not None and data_axis is not None:
        raise NotImplementedError(
            "3D data x gauss x tile training is not wired (pick two axes)"
        )
    band_opts = opts
    if tile_axis is not None:
        # per-band instance budget (parallel/tiles.py rationale — the
        # same uniform-spread assumption and watchdog escape hatch)
        band_opts = dataclasses.replace(
            opts,
            instance_capacity=max(
                (opts.instance_capacity // Dt + 127) // 128 * 128, 1024
            ),
        )
    obj_mask = render_object_mask(table) if table.num_models > 1 else None
    if o.get("lambda_scale_flatten", 0.0) > 0 or o.get("lambda_box_reg", 0.0) > 0:
        # these regularizers reduce over ALL rows; under sharding the
        # local sums would diverge per device. Wire them with a psum of
        # (sum, count) when a config actually enables them — both are
        # dormant in the reference too (defined, never wired).
        raise NotImplementedError(
            "lambda_scale_flatten / lambda_box_reg are not supported "
            "under gauss-sharded training yet"
        )

    def loss_fn(params, m2d_off, abs_full, aux, frame_inp, gt, key, step):
        cam = frame_inp.cam
        row_shard = None
        sky_jitter = None
        if tile_axis is not None:
            gy = (cam.H + 15) // 16
            gy_local = -(-gy // Dt)
            d = jax.lax.axis_index(tile_axis)
            row_shard = (d * gy_local, gy_local)
            # full-image sky jitter drawn exactly like the single-device
            # step (render_frame's internal draw, train mode only),
            # band-sliced — identical randomness (parallel/tiles.py)
            if params.sky is not None and band_opts.mode == "train":
                full = (
                    jax.random.uniform(
                        jax.random.fold_in(key, 1), (cam.H, cam.W, 2)
                    )
                    - 0.5
                )
                full = jnp.pad(
                    full,
                    ((0, gy_local * 16 * Dt - cam.H), (0, 0), (0, 0)),
                )
                sky_jitter = jax.lax.dynamic_slice_in_dim(
                    full, d * gy_local * 16, gy_local * 16, axis=0
                )
        out = _sharded_render(
            params, aux, table, pose_data, frame_inp, key, band_opts, axis,
            step, mean2d_offset=m2d_off, absgrad_dummy=abs_full,
            row_shard=row_shard, sky_jitter=sky_jitter,
        )

        def gather_rows(x):
            g = jax.lax.all_gather(x, tile_axis, axis=0, tiled=True)
            return g[: cam.H]

        out_full = out
        if tile_axis is not None:
            out_full = dict(out)
            for k in ("rgb", "acc", "depth", "T"):
                if k in out_full:
                    out_full[k] = gather_rows(out_full[k])
        out_obj = None
        use_obj_loss = jnp.asarray(1.0)
        if o.lambda_reg > 0 and obj_mask is not None:
            use_obj_loss = (step >= o.densify_until_iter).astype(jnp.float32)
            out_obj = _sharded_render(
                params, aux, table, pose_data, frame_inp, key, band_opts,
                axis, step, include_mask=obj_mask, compose_sky=False,
                row_shard=row_shard,
            )
            if tile_axis is not None:
                out_obj = {"acc": gather_rows(out_obj["acc"])}
        # aux/table omitted: the row-reducing regularizers they gate are
        # rejected above (local reductions would differ per shard)
        loss, scalars = compute_losses(
            out_full, out_obj, gt, params, cfg, frame_inp.cam.image_id,
            use_obj_loss,
        )
        scalars["psnr"] = L.psnr(out_full["rgb"], gt.image, gt.mask)
        ovf = (out["overflow"], out["overflow_instance"], out["overflow_tile"])
        # differentiate loss/(Dg*Dt) (gradient-calibration notes above);
        # scalars["loss"] stays the true loss
        return loss / (Dg * Dt), (scalars, out["radii"], ovf)

    def train_local(state: TrainState, frames_b, gts_b, key):
        if data_axis is not None:
            frame_inp = jax.tree.map(lambda x: x[0], frames_b)
            gt = jax.tree.map(lambda x: x[0], gts_b)
            dev_key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        else:
            frame_inp, gt = frames_b, gts_b
            # same key derivation as the single-device step
            # (train_lib.make_train_step) so identical seeds give the
            # same flip/jitter draws
            dev_key, _ = jax.random.split(key)
        step = state.step
        gidx = jax.lax.axis_index(axis)

        m2d_off = jnp.zeros((Cl, 2), jnp.float32)
        abs_full = jnp.zeros((C, 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (_, (scalars, radii, ovf)), grads = grad_fn(
            state.params, m2d_off, abs_full, state.aux, frame_inp, gt,
            dev_key, step,
        )
        g_params, g_m2d, g_abs_full = grads

        # ---- calibrate (rule table in the module comment above; with
        # tile_axis, per-row grads/cotangents are exact per-BAND
        # contributions — one extra psum over `tile` totals them) ----
        rep_axes = (axis,) + ((tile_axis,) if tile_axis is not None else ())
        g_rest = _dc.replace(g_params, gaussians=None)
        g_rest = jax.tree.map(lambda g: jax.lax.psum(g, rep_axes), g_rest)
        g_params = _dc.replace(g_rest, gaussians=g_params.gaussians)
        if tile_axis is not None:
            g_params = _dc.replace(
                g_params,
                gaussians=jax.tree.map(
                    lambda g: jax.lax.psum(g, tile_axis), g_params.gaussians
                ),
            )
            g_m2d = jax.lax.psum(g_m2d, tile_axis)
            g_abs_full = jax.lax.psum(g_abs_full, tile_axis)
            # band renders zero out-of-band radii (clip_screen_to_rows)
            radii = jax.lax.pmax(radii, tile_axis)
        g_abs = (
            jax.lax.dynamic_slice_in_dim(g_abs_full, gidx * Cl, Cl, axis=0)
            * Dg
        )
        radii_local = jax.lax.dynamic_slice_in_dim(radii, gidx * Cl, Cl, axis=0)

        if data_axis is not None:
            g_params = jax.lax.pmean(g_params, data_axis)

        # ---- densification stats on the LOCAL rows (per-camera norms
        # first, then summed over the batch — parallel/dp.py order) ----
        collect = (step < o.densify_until_iter).astype(jnp.float32)
        vis = radii_local > 0.0
        scale = jnp.array(
            [frame_inp.cam.W / 2.0, frame_inp.cam.H / 2.0], jnp.float32
        )
        gl = g_m2d * scale[None, :]
        ga = g_abs * scale[None, :]
        add_local = jnp.stack(
            [jnp.linalg.norm(gl, axis=-1), ga[:, 0] + ga[:, 1]], axis=-1
        )
        add_local = jnp.where(vis[:, None], add_local, 0.0) * collect
        denom_add = vis.astype(jnp.float32) * collect
        max_r = jnp.where(vis, radii_local, 0.0) * collect
        if data_axis is not None:
            add_local = jax.lax.psum(add_local, data_axis)
            denom_add = jax.lax.psum(denom_add, data_axis)
            max_r = jax.lax.pmax(max_r, data_axis)
        aux = _dc.replace(
            state.aux,
            grad_accum=state.aux.grad_accum + add_local,
            denom=state.aux.denom + denom_add,
            max_radii=jnp.maximum(state.aux.max_radii, max_r),
        )

        # ---- scalars: identical within a gauss group; average over
        # cameras; row counters summed over the row shards ----
        if data_axis is not None:
            scalars = jax.lax.pmean(scalars, data_axis)
        scalars["num_alive"] = jax.lax.psum(jnp.sum(aux.alive), axis)
        ovf_axes = ((data_axis,) if data_axis is not None else ()) + (
            (tile_axis,) if tile_axis is not None else ()
        )
        for name, v in zip(("overflow", "overflow_instance", "overflow_tile"), ovf):
            scalars[name] = jax.lax.psum(v, ovf_axes) if ovf_axes else v

        in_range = (frame_inp.cam.frame >= table.start_frame[aux.model_id]) & (
            frame_inp.cam.frame <= table.end_frame[aux.model_id]
        )
        if data_axis is not None:
            in_range = jax.lax.pmax(in_range.astype(jnp.float32), data_axis) > 0
        row_mask = aux.alive & in_range
        mask_tree = jax.tree.map(lambda _: jnp.ones((), jnp.float32), state.params)
        mask_tree = _dc.replace(
            mask_tree,
            gaussians=jax.tree.map(lambda _: row_mask, state.params.gaussians),
        )
        lr_tree = make_lr_tree(cfg, table, state.params, aux, step)

        if state.params.pose_correction is not None:
            g_params = _dc.replace(
                g_params,
                pose_correction=jax.tree.map(
                    lambda g, p: g + 0.01 * p,
                    g_params.pose_correction,
                    state.params.pose_correction,
                ),
            )

        new_params, new_adam = adam_update(
            state.params, g_params, state.adam, lr_tree, mask_tree
        )
        new_state = TrainState(
            params=new_params, adam=new_adam, aux=aux, step=step + 1
        )
        return new_state, scalars

    def build(state):
        specs = train_state_specs(state, axis)
        batch_spec = P(data_axis) if data_axis is not None else P()
        return jax.shard_map(
            train_local,
            mesh=mesh,
            in_specs=(specs, batch_spec, batch_spec, P()),
            out_specs=(specs, P()),
            check_vma=False,
        )

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, frames_b, gts_b, key):
        return build(state)(state, frames_b, gts_b, key)

    step_fn.mesh = mesh
    return step_fn
