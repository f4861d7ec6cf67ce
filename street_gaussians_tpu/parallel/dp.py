"""Camera-data-parallel training over a device mesh.

No reference analog — the reference is strictly single-GPU,
batch = 1 camera/iteration (SURVEY.md §2.6; lib/utils/cfg_utils.py:9-11
only sets CUDA_VISIBLE_DEVICES). This is the TPU-native scaling layer:

  * mesh axis 'data' over the chips of a slice (ICI);
  * each device renders ONE camera end-to-end (preprocess -> binning ->
    Pallas tile blend) on its local shard of the batch — replicated
    parameters, `shard_map` isolation so the per-device pipeline is
    byte-identical to the single-chip path;
  * gradients / densification statistics are `lax.pmean`/`psum`-reduced
    over ICI, then every device applies the same masked-Adam update to
    its parameter replica (no divergence: same inputs, same math).

Semantics vs the reference: a batch of B cameras per step equals B
reference iterations' gradients averaged into one Adam step (standard
data-parallel semantics); densification statistics accumulate the sum
over the batch exactly as B sequential renders would.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from street_gaussians_tpu.config import Config
from street_gaussians_tpu.models import gaussians as G
from street_gaussians_tpu.models.actor_pose import ActorPoseData
from street_gaussians_tpu.models.renderer import (
    FrameInput,
    RenderOptions,
    render_frame,
    render_object_mask,
)
from street_gaussians_tpu.optim.adam import adam_update
from street_gaussians_tpu.train_lib import (
    GroundTruth,
    TrainState,
    compute_losses,
    make_lr_tree,
)
from street_gaussians_tpu.utils import losses as L


def make_mesh(n_data: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data or len(devices)
    return Mesh(np.array(devices[:n]), axis_names=("data",))


def stack_frames(frames) -> FrameInput:
    """Stack per-camera FrameInputs into a batched pytree (leading B).
    All cameras must share (H, W) — group batches by sensor."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)


def stack_gts(gts) -> GroundTruth:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *gts)


def make_data_parallel_train_step(
    cfg: Config,
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    opts: RenderOptions,
    mesh: Mesh,
):
    """Build the pjit-ted DP train step.

    Returns step_fn(state, frames_b, gts_b, key) -> (state, scalars)
    where frames_b/gts_b are batched pytrees with leading dim =
    mesh.shape['data'] (one camera per device).
    """
    o = cfg.optim
    C = table.capacity
    n_data = mesh.shape["data"]
    obj_mask = render_object_mask(table) if table.num_models > 1 else None

    def loss_fn(params, m2d_off, abs_dummy, aux, frame_inp, gt, key, step):
        out = render_frame(
            params, aux, table, pose_data, frame_inp, step,
            include_mask=None, key=key, opts=opts,
            mean2d_offset=m2d_off, absgrad_dummy=abs_dummy,
        )
        out_obj = None
        use_obj_loss = jnp.asarray(1.0)
        if o.lambda_reg > 0 and obj_mask is not None:
            use_obj_loss = (step >= o.densify_until_iter).astype(jnp.float32)
            out_obj = render_frame(
                params, aux, table, pose_data, frame_inp, step,
                include_mask=obj_mask, key=key, opts=opts, compose_sky=False,
            )
        loss, scalars = compute_losses(
            out, out_obj, gt, params, cfg, frame_inp.cam.image_id, use_obj_loss,
            aux=aux, table=table,
        )
        scalars["psnr"] = L.psnr(out["rgb"], gt.image, gt.mask)
        ovf = (out["overflow"], out["overflow_instance"], out["overflow_tile"])
        return loss, (scalars, out["radii"], ovf)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def dp_step(state: TrainState, frames_b, gts_b, key):
        # local shard: leading dim 1 (one camera per device)
        frame_inp = jax.tree.map(lambda x: x[0], frames_b)
        gt = jax.tree.map(lambda x: x[0], gts_b)
        step = state.step
        dev_key = jax.random.fold_in(key, jax.lax.axis_index("data"))

        m2d_off = jnp.zeros((C, 2), jnp.float32)
        abs_dummy = jnp.zeros((C, 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (loss, (scalars, radii, ovf)), grads = grad_fn(
            state.params, m2d_off, abs_dummy, state.aux, frame_inp, gt, dev_key, step
        )
        g_params, g_m2d, g_abs = grads

        # ---- densification stats: per-camera norms FIRST (the reference
        # accumulates per-render norms, street_gaussian_model.py:562-571),
        # then sum over the batch ----
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
        add = jax.lax.psum(add_local, "data")
        denom_add = jax.lax.psum(vis.astype(jnp.float32), "data") * collect
        max_r = jax.lax.pmax(jnp.where(vis, radii, 0.0), "data") * collect
        aux = dataclasses.replace(
            state.aux,
            grad_accum=state.aux.grad_accum + add,
            denom=state.aux.denom + denom_add,
            max_radii=jnp.maximum(state.aux.max_radii, max_r),
        )

        # ---- ICI collectives: average param grads + metrics ----
        g_params = jax.lax.pmean(g_params, "data")
        scalars = jax.lax.pmean(scalars, "data")
        scalars["num_alive"] = jnp.sum(aux.alive)
        # overflow counters SUMMED (not averaged) over the batch so the
        # runner's watchdog sees every dropped instance on every device —
        # without this, capacity drops were invisible at batch_size > 1
        scalars["overflow"] = jax.lax.psum(ovf[0], "data")
        scalars["overflow_instance"] = jax.lax.psum(ovf[1], "data")
        scalars["overflow_tile"] = jax.lax.psum(ovf[2], "data")

        in_range = (frame_inp.cam.frame >= table.start_frame[aux.model_id]) & (
            frame_inp.cam.frame <= table.end_frame[aux.model_id]
        )
        in_range = jax.lax.pmax(in_range.astype(jnp.float32), "data") > 0
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

    step_fn = jax.jit(dp_step, donate_argnums=(0,))

    def wrapped(state, frames_b, gts_b, key):
        return step_fn(state, frames_b, gts_b, key)

    wrapped.mesh = mesh
    wrapped.n_data = n_data
    return wrapped


def init_multihost() -> None:
    """Initialize JAX's multi-host runtime (DCN). MUST run before any
    backend exists — importing this module already creates one (jnp
    constants), so the real call site is train.py, which initializes
    before importing the training machinery. Kept for API completeness;
    raises if a backend was already created and distributed init is
    actually needed."""
    import jax

    jax.distributed.initialize()


def make_multihost_mesh(data_per_host: int = None) -> Mesh:
    """'data' mesh spanning ALL hosts' devices: gradient all-reduce
    rides ICI within a host/slice and DCN across hosts — the
    BASELINE.md >=85%-to-2-hosts scaling target. Use with
    `make_data_parallel_train_step` unchanged (shard_map only sees the
    mesh); each host feeds its local cameras via
    jax.make_array_from_process_local_data on the stacked batch.

    data_per_host selects the first `data_per_host` devices OF EACH
    process (a plain devices[:n] prefix would take them all from the
    first hosts and leave later hosts with no addressable device in
    the mesh)."""
    import jax

    devices = jax.devices()  # global, ordered host-major
    if data_per_host is not None:
        per_proc = {}
        sel = []
        for d in devices:
            k = d.process_index
            if per_proc.get(k, 0) < data_per_host:
                per_proc[k] = per_proc.get(k, 0) + 1
                sel.append(d)
        devices = sel
    return Mesh(np.array(devices), axis_names=("data",))
