"""Row(tile)-sharded rendering: one camera's image split across the
mesh's 'tile' axis.

No reference analog — the CUDA renderer is strictly single-GPU
(SURVEY.md §2.6); this is the TPU-native path for using multiple chips
to accelerate a SINGLE render (serving latency) and for scenes whose
per-frame instance lists exceed one chip's capacity.

Scheme: parameters and the composed/preprocessed gaussians are
replicated (per-gaussian math is a few ms); each device then restricts
the screen-space gaussians to its horizontal band of 16-px tile rows
(`clip_screen_to_rows`), runs binning + the Pallas blend on only its
band (instance capacity divides by the shard count), renders its rows,
and the full image is re-assembled with one `all_gather` over ICI.
The backward runs band-local and shard_map's replicated-input rule
psums the per-gaussian gradients automatically — so fwd+bwd equals the
single-device path to f32 reassociation.
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
)


def make_tile_mesh(n_tile: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_tile or len(devices)
    return Mesh(np.array(devices[:n]), axis_names=("tile",))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def make_row_sharded_render(
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    opts: RenderOptions,
    mesh: Mesh,
    axis: str = "tile",
    include_mask=None,
):
    """Returns jitted render(params, aux, frame_inp) -> out dict with
    full-image rgb/acc/depth/T (replicated) and globally-reduced
    radii/visibility. Composable with camera-DP: give `mesh` a 'data'
    axis and shard frame_inp over it outside (see tests/test_tiles.py).
    """
    D = mesh.shape[axis]
    # per-device instance budget: the band sees ~1/D of the instances
    local_opts = dataclasses.replace(
        opts,
        instance_capacity=max(_round_up(opts.instance_capacity // D, 128), 1024),
    )

    def render_local(params, aux, frame_inp, key):
        cam = frame_inp.cam
        gy = (cam.H + 15) // 16
        gy_local = _round_up(gy, D) // D
        d = jax.lax.axis_index(axis)
        out = render_frame(
            params,
            aux,
            table,
            pose_data,
            frame_inp,
            step=jnp.asarray(10 ** 9),
            include_mask=include_mask,
            key=key,
            opts=local_opts,
            row_shard=(d * gy_local, gy_local),
        )
        H_pad = gy_local * 16 * D

        def gather_rows(x):
            g = jax.lax.all_gather(x, axis, axis=0, tiled=True)
            return g[: cam.H]

        res = {
            k: gather_rows(out[k])
            for k in ("rgb", "acc", "depth", "T")
            if k in out
        }
        for k in ("normals", "semantic"):
            if k in out:
                res[k] = gather_rows(out[k])
        # per-gaussian quantities: band-local -> global
        res["radii"] = jax.lax.pmax(out["radii"], axis)
        res["visibility"] = res["radii"] > 0
        # all three counters must survive the shard boundary: the serving
        # regrow guard (runner.render_sets) keys on overflow_instance, and
        # tile-sharded bands divide instance_capacity by D — exactly the
        # mode where instance drops are most likely (ADVICE r3).
        for k in ("overflow", "overflow_instance", "overflow_tile"):
            if k in out:
                res[k] = jax.lax.psum(out[k], axis)
        res["num_instances"] = jax.lax.psum(out["num_instances"], axis)
        return res

    specs_in = (P(), P(), P(), P())
    fn = jax.shard_map(
        render_local,
        mesh=mesh,
        in_specs=specs_in,
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def render(params, aux, frame_inp, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        return fn(params, aux, frame_inp, key)

    return render

# ---------------------------------------------------------------------------
# Tile-sharded TRAINING: the binning + Pallas blend forward AND backward
# of every train-step render split over tile-row bands.
#
# Camera-DP scales cameras/sec and gauss-sharding scales HBM; neither
# shortens ONE iteration. This is the remaining §2.6 composition
# (SURVEY.md: "tile-sharded rendering of one image across chips",
# extended to the backward) and the only mechanism by which N chips beat
# a single device on wall-clock per iteration. No reference analog (the
# reference is single-GPU, lib/utils/cfg_utils.py:9-11).
#
# Scheme: parameters, Adam state and densification stats stay REPLICATED
# (per-gaussian math is a few ms; the blend dominates). Each device
# renders its horizontal band of 16-px tile rows (row_shard), the band
# images are re-assembled with one all_gather over ICI, and every device
# computes the SAME full-image loss (SSIM windows cross band boundaries,
# so band-local losses would not equal the single-device loss).
#
# Gradient calibration inside shard_map (check_vma=False = manual
# bookkeeping): we differentiate loss/D. The all_gather's VJP is a
# psum-scatter summing the D identical image cotangents — each band
# receives exactly its true pixel cotangent — and the band-local blend
# backward then yields that band's CONTRIBUTION to every per-gaussian
# gradient. One psum over the tile axis reconstructs the exact total
# (a gaussian spanning k bands sums its k band contributions, exactly
# like the single-device kernel sums its tiles). Loss paths that never
# cross the gather (scale-flatten / box-reg row regularizers) are
# computed identically on every device, so the same psum turns D copies
# of true/D into the true gradient. Every device then applies the same
# masked-Adam update to its replica.
# ---------------------------------------------------------------------------


def make_tile_sharded_train_step(
    cfg,
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    opts: RenderOptions,
    mesh: Mesh,
    axis: str = "tile",
    data_axis: Optional[str] = None,
):
    """Build the jitted tile-sharded train step.

    1D mesh (data_axis=None): step_fn(state, frame_inp, gt, key) — one
    camera per step, its render fwd+bwd split over `axis` bands.
    2D mesh (data_axis='data'): step_fn(state, frames_b, gts_b, key)
    with leading batch dim = mesh.shape[data_axis] — camera-DP composed
    with tile-sharding (each camera's render split over the tile axis,
    gradients pmean'd over cameras as in parallel/dp.py).

    State stays replicated; N sharded steps match single-device steps
    (tests/test_tile_train.py, tolerances documented there).
    """
    from street_gaussians_tpu.optim.adam import adam_update
    from street_gaussians_tpu.train_lib import (
        TrainState,
        compute_losses,
        make_lr_tree,
    )
    from street_gaussians_tpu.utils import losses as L

    o = cfg.optim
    C = table.capacity
    Dt = mesh.shape[axis]
    obj_mask = render_object_mask(table) if table.num_models > 1 else None
    # Per-band capacity assumes instances spread ~uniformly over tile-row
    # bands; a skewed scene (e.g. a dense ground band) can overflow a band
    # and drop instances where the single-device step would not, perturbing
    # gradients until the psum'd overflow watchdog regrows capacity. Such
    # runs need a larger train.instance_capacity (the per-band share is
    # intentionally NOT over-provisioned here: band arrays scale with it,
    # which is the whole point of tile sharding).
    local_opts = dataclasses.replace(
        opts,
        instance_capacity=max(_round_up(opts.instance_capacity // Dt, 128), 1024),
    )

    def band_render(params, aux, frame_inp, key, step, **kw):
        """render_frame restricted to this device's tile-row band."""
        cam = frame_inp.cam
        gy = (cam.H + 15) // 16
        gy_local = _round_up(gy, Dt) // Dt
        d = jax.lax.axis_index(axis)
        return (
            render_frame(
                params, aux, table, pose_data, frame_inp, step,
                key=key, opts=local_opts,
                row_shard=(d * gy_local, gy_local),
                **kw,
            ),
            gy_local,
            d,
        )

    def loss_fn(params, m2d_off, abs_dummy, aux, frame_inp, gt, key, step):
        cam = frame_inp.cam
        # full-image sky jitter drawn exactly like the single-device step
        # (render_frame's internal draw: train mode only), band-sliced
        # below — so the sharded step consumes identical randomness
        use_jitter = params.sky is not None and local_opts.mode == "train"
        if use_jitter:
            full = (
                jax.random.uniform(
                    jax.random.fold_in(key, 1), (cam.H, cam.W, 2)
                )
                - 0.5
            )
            gy = (cam.H + 15) // 16
            H_pad = _round_up(gy, Dt) // Dt * 16 * Dt
            full = jnp.pad(full, ((0, H_pad - cam.H), (0, 0), (0, 0)))

        def band_jitter(d, gy_local):
            if not use_jitter:
                return None
            return jax.lax.dynamic_slice_in_dim(
                full, d * gy_local * 16, gy_local * 16, axis=0
            )

        gy = (cam.H + 15) // 16
        gy_local0 = _round_up(gy, Dt) // Dt
        d0 = jax.lax.axis_index(axis)
        out, gy_local, d = band_render(
            params, aux, frame_inp, key, step,
            mean2d_offset=m2d_off, absgrad_dummy=abs_dummy,
            sky_jitter=band_jitter(d0, gy_local0),
        )

        def gather_rows(x):
            g = jax.lax.all_gather(x, axis, axis=0, tiled=True)
            return g[: cam.H]

        out_full = dict(out)
        for k in ("rgb", "acc", "depth", "T"):
            if k in out_full:
                out_full[k] = gather_rows(out_full[k])

        out_obj_full = None
        use_obj_loss = jnp.asarray(1.0)
        if o.lambda_reg > 0 and obj_mask is not None:
            use_obj_loss = (step >= o.densify_until_iter).astype(jnp.float32)
            out_obj, _, _ = band_render(
                params, aux, frame_inp, key, step,
                include_mask=obj_mask, compose_sky=False,
            )
            out_obj_full = {"acc": gather_rows(out_obj["acc"])}
        loss, scalars = compute_losses(
            out_full, out_obj_full, gt, params, cfg, frame_inp.cam.image_id,
            use_obj_loss, aux=aux, table=table,
        )
        scalars["psnr"] = L.psnr(out_full["rgb"], gt.image, gt.mask)
        ovf = (out["overflow"], out["overflow_instance"], out["overflow_tile"])
        # differentiate loss/D (calibration note above); scalars["loss"]
        # stays the true loss
        return loss / Dt, (scalars, out["radii"], ovf)

    def train_local(state: TrainState, frames_b, gts_b, key):
        if data_axis is not None:
            frame_inp = jax.tree.map(lambda x: x[0], frames_b)
            gt = jax.tree.map(lambda x: x[0], gts_b)
            dev_key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        else:
            frame_inp, gt = frames_b, gts_b
            # same key derivation as train_lib.make_train_step so
            # identical seeds give identical flip/jitter draws
            dev_key, _ = jax.random.split(key)
        step = state.step

        m2d_off = jnp.zeros((C, 2), jnp.float32)
        abs_dummy = jnp.zeros((C, 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (_, (scalars, radii_band, ovf)), grads = grad_fn(
            state.params, m2d_off, abs_dummy, state.aux, frame_inp, gt,
            dev_key, step,
        )
        g_params, g_m2d, g_abs = grads

        # ---- calibrate: band contributions -> exact totals ----
        g_params = jax.tree.map(lambda g: jax.lax.psum(g, axis), g_params)
        g_m2d = jax.lax.psum(g_m2d, axis)
        g_abs = jax.lax.psum(g_abs, axis)
        # clip_screen_to_rows zeroes out-of-band radii, so pmax over the
        # bands reconstructs the single-device radii
        radii = jax.lax.pmax(radii_band, axis)
        if data_axis is not None:
            g_params = jax.lax.pmean(g_params, data_axis)

        # ---- densification stats (per-camera norms first, then summed
        # over the batch — parallel/dp.py order) ----
        collect = (step < o.densify_until_iter).astype(jnp.float32)
        vis = radii > 0.0
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
        max_r = jnp.where(vis, radii, 0.0) * collect
        if data_axis is not None:
            add_local = jax.lax.psum(add_local, data_axis)
            denom_add = jax.lax.psum(denom_add, data_axis)
            max_r = jax.lax.pmax(max_r, data_axis)
        aux = dataclasses.replace(
            state.aux,
            grad_accum=state.aux.grad_accum + add_local,
            denom=state.aux.denom + denom_add,
            max_radii=jnp.maximum(state.aux.max_radii, max_r),
        )

        # ---- scalars: identical within a tile group (full-image loss on
        # every device); averaged over cameras; drop counters summed over
        # bands AND cameras so the watchdog sees every dropped instance ----
        if data_axis is not None:
            scalars = jax.lax.pmean(scalars, data_axis)
        scalars["num_alive"] = jnp.sum(aux.alive)
        ovf_axes = (axis,) + ((data_axis,) if data_axis is not None else ())
        for name, v in zip(("overflow", "overflow_instance", "overflow_tile"), ovf):
            scalars[name] = jax.lax.psum(v, ovf_axes)

        in_range = (frame_inp.cam.frame >= table.start_frame[aux.model_id]) & (
            frame_inp.cam.frame <= table.end_frame[aux.model_id]
        )
        if data_axis is not None:
            in_range = jax.lax.pmax(in_range.astype(jnp.float32), data_axis) > 0
        row_mask = aux.alive & in_range
        mask_tree = jax.tree.map(lambda _: jnp.ones((), jnp.float32), state.params)
        mask_tree = dataclasses.replace(
            mask_tree,
            gaussians=jax.tree.map(lambda _: row_mask, state.params.gaussians),
        )
        lr_tree = make_lr_tree(cfg, table, state.params, aux, step)

        if state.params.pose_correction is not None:
            g_params = dataclasses.replace(
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

    batch_spec = P(data_axis) if data_axis is not None else P()
    fn = jax.shard_map(
        train_local,
        mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, frames_b, gts_b, key):
        return fn(state, frames_b, gts_b, key)

    step_fn.mesh = mesh
    return step_fn
