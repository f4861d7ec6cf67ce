"""Training machinery: jitted train step + LR trees + loss stack.

Functional re-design of the reference hot loop (ref: train.py:64-225):
one jitted step computes render -> losses -> grads -> masked-Adam
update; the host loop only feeds cameras and triggers the (separately
jitted) densify / opacity-reset functions at their intervals, so
shapes stay static and nothing recompiles as the Gaussian population
changes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.config import Config
from street_gaussians_tpu.models import gaussians as G
from street_gaussians_tpu.models.actor_pose import ActorPoseData
from street_gaussians_tpu.models.corrections import (
    color_correction_reg,
    pose_correction_reg,
)
from street_gaussians_tpu.models.renderer import (
    FrameInput,
    RenderOptions,
    SceneParams,
    render_frame,
    render_object_mask,
)
from street_gaussians_tpu.optim.adam import AdamState, adam_init, adam_update
from street_gaussians_tpu.optim.densify import (
    DensifyConfig,
    accumulate_stats,
    densify_and_prune,
    reset_opacity,
)
from street_gaussians_tpu.optim.schedule import expon_lr
from street_gaussians_tpu.utils import losses as L


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: SceneParams
    adam: AdamState  # over the full SceneParams tree
    aux: G.GaussianAux
    step: jnp.ndarray  # scalar int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GroundTruth:
    """Per-camera supervision bundle. Missing guidance is replaced by
    neutral tensors; the corresponding loss weight gates it off."""

    image: jnp.ndarray  # [H, W, 3]
    mask: jnp.ndarray  # [H, W, 1] bool (all-true when absent)
    sky_mask: jnp.ndarray  # [H, W, 1] bool
    lidar_depth: jnp.ndarray  # [H, W] (0 where invalid)
    obj_bound: jnp.ndarray  # [H, W, 1] bool
    sky_scale: jnp.ndarray  # scalar per-camera lambda_sky multiplier


def init_train_state(params: SceneParams, aux: G.GaussianAux) -> TrainState:
    # per-row step counters for the packed Gaussian leaves (torch keeps a
    # per-tensor Adam step; rows = sub-model tensors here)
    row_counts = jax.tree.map(lambda _: False, params)
    row_counts = dataclasses.replace(
        row_counts, gaussians=jax.tree.map(lambda _: True, params.gaussians)
    )
    return TrainState(
        params=params,
        adam=adam_init(params, row_counts),
        aux=aux,
        step=jnp.zeros((), jnp.int32),
    )


def _gaussian_lr_tree(cfg: Config, table: G.SceneTable, mid, step):
    """Per-row learning rates for the packed Gaussian leaves.

    xyz follows the exponential schedule scaled by each model's
    spatial_lr_scale (ref: gaussian_model.py:286-325); actors can
    override the endpoints via *_obj keys
    (ref: gaussian_model_actor.py:163-198). The other leaves use
    constant per-model rates.
    """
    o = cfg.optim
    is_actor = mid > 0

    def actor_or(key_obj: str, default: float):
        return jnp.where(is_actor, o.get(key_obj, default), default)

    pos_init = actor_or("position_lr_init_obj", o.position_lr_init)
    pos_final = actor_or("position_lr_final_obj", o.position_lr_final)
    sls = table.spatial_lr_scale[mid]
    t = jnp.clip(step.astype(jnp.float32) / o.position_lr_max_steps, 0.0, 1.0)
    # the reference builds its schedule with lr_delay_steps=0, so the
    # delay ramp is inactive (general_utils.py:73-80)
    xyz_lr = jnp.exp(
        jnp.log(pos_init * sls) * (1.0 - t) + jnp.log(pos_final * sls) * t
    )

    feature_lr = actor_or("feature_lr_obj", o.feature_lr)
    feature_rest_lr = jnp.where(
        is_actor,
        o.get("feature_rest_lr_obj", o.get("feature_lr_obj", o.feature_lr) / 20.0),
        o.feature_lr / 20.0,
    )
    return G.GaussianParams(
        xyz=xyz_lr,
        feat_dc=feature_lr,
        feat_rest=feature_rest_lr,
        log_scale=actor_or("scaling_lr_obj", o.scaling_lr),
        rot=actor_or("rotation_lr_obj", o.rotation_lr),
        opacity_logit=actor_or("opacity_lr_obj", o.opacity_lr),
        semantic=actor_or("semantic_lr_obj", o.get("semantic_lr", 0.01)),
    )


def make_lr_tree(cfg: Config, table: G.SceneTable, params: SceneParams, aux, step):
    o = cfg.optim
    iters = cfg.train.iterations
    lr = SceneParams(
        gaussians=_gaussian_lr_tree(cfg, table, aux.model_id, step),
        actor_pose=None,
        sky=None,
        color_correction=None,
        pose_correction=None,
    )
    if params.actor_pose is not None:
        # warmup until first opacity reset (ref: actor_pose.py:55-66)
        lr = dataclasses.replace(
            lr,
            actor_pose=type(params.actor_pose)(
                opt_trans=expon_lr(
                    step,
                    o.track_position_lr_init,
                    o.track_position_lr_final,
                    lr_delay_mult=o.track_position_lr_delay_mult,
                    max_steps=o.track_position_max_steps,
                    warmup_steps=o.opacity_reset_interval,
                ),
                opt_rots=expon_lr(
                    step,
                    o.track_rotation_lr_init,
                    o.track_rotation_lr_final,
                    lr_delay_mult=o.track_rotation_lr_delay_mult,
                    max_steps=o.track_rotation_max_steps,
                    warmup_steps=o.opacity_reset_interval,
                ),
            ),
        )
    if params.sky is not None:
        lr = dataclasses.replace(
            lr,
            sky=type(params.sky)(
                cubemap=expon_lr(
                    step,
                    o.get("sky_cube_map_lr_init", 0.01),
                    o.get("sky_cube_map_lr_final", 0.0001),
                    max_steps=o.get("sky_cube_map_max_steps", iters),
                )
            ),
        )
    if params.color_correction is not None:
        cc_lr = expon_lr(
            step,
            o.get("color_correction_lr_init", 5e-4),
            o.get("color_correction_lr_final", 5e-5),
            max_steps=o.get("color_correction_max_steps", iters),
        )
        lr = dataclasses.replace(
            lr,
            color_correction=type(params.color_correction)(
                affine=cc_lr, affine_sky=cc_lr
            ),
        )
    if params.pose_correction is not None:
        pc_lr = expon_lr(
            step,
            o.get("pose_correction_lr_init", 5e-6),
            o.get("pose_correction_lr_final", 1e-6),
            max_steps=o.get("pose_correction_max_steps", iters),
        )
        lr = dataclasses.replace(
            lr,
            pose_correction=type(params.pose_correction)(trans=pc_lr, rots=pc_lr),
        )
    return lr


def trimmed_l1_depth(expected, lidar, mask_2d, trim: float = 0.95):
    """Masked L1 over the lowest 95% of per-pixel errors — the static-
    shape equivalent of the reference's topk trimming (train.py:125-132).

    The k-th-smallest threshold comes from a 31-step binary search over
    IEEE-754 bit patterns (non-negative floats order-match their int
    bits), not a full-image sort: 31 counting reduces over the [H, W]
    error map cost ~1.5 ms where the 1.7M-element `jnp.sort` cost ~6 ms.
    The selected threshold is EXACTLY the sort's k-th smallest value.
    (One degenerate-state difference vs the sort: if masked errors are
    NaN — diverged training — the bisection treats them as +inf and
    still averages the finite errors, where the sort yielded a NaN
    threshold and a zero loss. The finite-average is the saner signal.)
    """
    err = jnp.abs(expected - lidar)
    masked = jnp.where(mask_2d, err, jnp.inf)
    n = jnp.sum(mask_2d)
    k = jnp.maximum(jnp.floor(trim * n.astype(jnp.float32)).astype(jnp.int32), 1)
    bits = jax.lax.bitcast_convert_type(masked, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2  # (lo+hi)//2 overflows int32
        cnt = jnp.sum(bits <= mid)
        return jnp.where(cnt >= k, lo, mid + 1), jnp.where(cnt >= k, mid, hi)

    # invariant: k-th smallest bits value in [lo, hi]; +inf bits bound hi
    lo, hi = jax.lax.fori_loop(
        0, 31, body, (jnp.int32(0), jnp.int32(0x7F800000))
    )
    thr = jax.lax.bitcast_convert_type(hi, jnp.float32)
    keep = (err <= thr) & mask_2d & jnp.isfinite(err)
    return jnp.sum(jnp.where(keep, err, 0.0)) / jnp.maximum(jnp.sum(keep), 1.0)


def compute_losses(
    out: Dict[str, jnp.ndarray],
    out_obj: Optional[Dict[str, jnp.ndarray]],
    gt: GroundTruth,
    params: SceneParams,
    cfg: Config,
    cam_image_id,
    use_obj_loss,
    aux=None,
    table=None,
):
    """The reference loss stack (ref: train.py:100-140) plus the dormant
    regularizers the reference defines but never wires
    (scale-flatten, box-reg) — active only when their lambdas are set."""
    o = cfg.optim
    scalars = {}
    image = out["rgb"]
    mask = gt.mask

    l1 = L.l1_loss(image, gt.image, mask)
    scalars["l1_loss"] = l1
    loss = (1.0 - o.lambda_dssim) * o.lambda_l1 * l1 + o.lambda_dssim * (
        1.0 - L.ssim(image, gt.image, mask=mask)
    )

    if o.lambda_sky > 0:
        acc = jnp.clip(out["acc"], 1e-6, 1.0 - 1e-6)[..., None]
        sky_loss = jnp.mean(
            jnp.where(gt.sky_mask, -jnp.log(1.0 - acc), -jnp.log(acc))
        )
        sky_loss = sky_loss * gt.sky_scale
        scalars["sky_loss"] = sky_loss
        loss = loss + o.lambda_sky * sky_loss

    if out_obj is not None:
        acc_obj = jnp.clip(out_obj["acc"], 1e-6, 1.0 - 1e-6)[..., None]
        obj_acc_loss = jnp.mean(
            jnp.where(
                gt.obj_bound,
                -(acc_obj * jnp.log(acc_obj) + (1 - acc_obj) * jnp.log(1 - acc_obj)),
                -jnp.log(1.0 - acc_obj),
            )
        )
        scalars["obj_acc_loss"] = obj_acc_loss
        loss = loss + o.lambda_reg * obj_acc_loss * use_obj_loss

    if o.lambda_depth_lidar > 0:
        depth_mask = (gt.lidar_depth > 0.0) & mask[..., 0]
        # the reference divides by acc + 1e-10 (train.py:127); on pixels a
        # Gaussian barely grazes (acc ~ 1e-6) that gradient explodes to
        # inf on TPU f32 — clamp the denominator instead: identical for
        # any normally-covered pixel, bounded gradients otherwise (such
        # pixels' huge errors are trimmed by the top-95% cut anyway)
        expected = out["depth"] / jnp.maximum(out["acc"], 1e-2)
        lidar_loss = trimmed_l1_depth(expected, gt.lidar_depth, depth_mask)
        scalars["lidar_depth_loss"] = lidar_loss
        loss = loss + o.lambda_depth_lidar * lidar_loss

    if o.lambda_color_correction > 0 and params.color_correction is not None:
        cc = color_correction_reg(params.color_correction, cam_image_id)
        scalars["color_correction_reg_loss"] = cc
        loss = loss + o.lambda_color_correction * cc

    if o.lambda_pose_correction > 0 and params.pose_correction is not None:
        pc = pose_correction_reg(params.pose_correction)
        scalars["pose_correction_reg_loss"] = pc
        loss = loss + o.lambda_pose_correction * pc

    if o.get("lambda_scale_flatten", 0.0) > 0 and aux is not None:
        sf = G.scale_flatten_loss(params.gaussians, aux.alive)
        scalars["scale_flatten_loss"] = sf
        loss = loss + o.lambda_scale_flatten * sf

    if o.get("lambda_box_reg", 0.0) > 0 and aux is not None and table is not None:
        br = G.box_reg_loss(params.gaussians, aux, table)
        scalars["box_reg_loss"] = br
        loss = loss + o.lambda_box_reg * br

    scalars["loss"] = loss
    return loss, scalars


def make_train_step(
    cfg: Config,
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    opts: RenderOptions,
    donate: bool = True,
):
    """Build the jitted single-camera train step.

    Returns step_fn(state, frame_inp, gt, key) -> (state, metrics).
    """
    o = cfg.optim
    C = table.capacity
    obj_mask = render_object_mask(table) if table.num_models > 1 else None

    def loss_fn(params, m2d_off, abs_dummy, state_aux, frame_inp, gt, key, step):
        out = render_frame(
            params,
            state_aux,
            table,
            pose_data,
            frame_inp,
            step,
            include_mask=None,
            key=key,
            opts=opts,
            mean2d_offset=m2d_off,
            absgrad_dummy=abs_dummy,
        )
        out_obj = None
        use_obj_loss = jnp.asarray(1.0)
        if o.lambda_reg > 0 and obj_mask is not None:
            # reference enables this only once densification has ended
            # (train.py:114: iteration >= densify_until_iter)
            use_obj_loss = (step >= o.densify_until_iter).astype(jnp.float32)
            out_obj = render_frame(
                params,
                state_aux,
                table,
                pose_data,
                frame_inp,
                step,
                include_mask=obj_mask,
                key=key,
                opts=opts,
                compose_sky=False,
            )
        loss, scalars = compute_losses(
            out, out_obj, gt, params, cfg, frame_inp.cam.image_id, use_obj_loss,
            aux=state_aux, table=table,
        )
        scalars["psnr"] = L.psnr(out["rgb"], gt.image, gt.mask)
        ovf = (out["overflow"], out["overflow_instance"], out["overflow_tile"])
        return loss, (scalars, out["radii"], ovf)

    def step_fn(state: TrainState, frame_inp: FrameInput, gt: GroundTruth, key):
        step = state.step
        k_render, _ = jax.random.split(key)
        m2d_off = jnp.zeros((C, 2), jnp.float32)
        abs_dummy = jnp.zeros((C, 2), jnp.float32)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (loss, (scalars, radii, ovf)), grads = grad_fn(
            state.params, m2d_off, abs_dummy, state.aux, frame_inp, gt, k_render, step
        )
        g_params, g_m2d, g_abs = grads

        # densification statistics (train.py:186-195), only while densifying
        collect = (step < o.densify_until_iter).astype(jnp.float32)
        aux = accumulate_stats(
            state.aux,
            radii * collect,
            g_m2d * collect,
            g_abs * collect,
            frame_inp.cam.W,
            frame_inp.cam.H,
        )

        # per-row activity mask: torch skips params with no grad
        # (set_to_none) — rows of models not visible at this frame
        in_range = (frame_inp.cam.frame >= table.start_frame[aux.model_id]) & (
            frame_inp.cam.frame <= table.end_frame[aux.model_id]
        )
        row_mask = aux.alive & in_range
        mask_tree = jax.tree.map(lambda _: jnp.ones((), jnp.float32), state.params)
        mask_tree = dataclasses.replace(
            mask_tree, gaussians=jax.tree.map(lambda _: row_mask, state.params.gaussians)
        )

        lr_tree = make_lr_tree(cfg, table, state.params, aux, step)

        # pose-correction weight decay 0.01 (ref: camera_pose.py:51)
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

        scalars["overflow"] = ovf[0]
        scalars["overflow_instance"] = ovf[1]
        scalars["overflow_tile"] = ovf[2]
        scalars["num_alive"] = jnp.sum(aux.alive)
        new_state = TrainState(
            params=new_params, adam=new_adam, aux=aux, step=step + 1
        )
        return new_state, scalars

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_densify_fn(cfg: Config, table: G.SceneTable):
    """Jitted densify round operating on the full TrainState."""
    o = cfg.optim
    dcfg = DensifyConfig(
        densify_grad_threshold=o.densify_grad_threshold,
        densify_grad_threshold_bkgd=o.get("densify_grad_threshold_bkgd"),
        densify_grad_threshold_obj=o.get("densify_grad_threshold_obj"),
        densify_grad_abs_bkgd=o.densify_grad_abs_bkgd,
        densify_grad_abs_obj=o.densify_grad_abs_obj,
        percent_dense=o.percent_dense,
        percent_big_ws=o.percent_big_ws,
        min_opacity=o.min_opacity,
    )

    @jax.jit
    def densify_fn(state: TrainState, key, prune_big_points):
        g_adam = AdamState(
            mu=state.adam.mu.gaussians,
            nu=state.adam.nu.gaussians,
            count=state.adam.count.gaussians,
        )
        new_g, new_gadam, new_aux, diag = densify_and_prune(
            state.params.gaussians, g_adam, state.aux, table, key, dcfg, prune_big_points
        )
        new_params = dataclasses.replace(state.params, gaussians=new_g)
        new_adam = AdamState(
            mu=dataclasses.replace(state.adam.mu, gaussians=new_gadam.mu),
            nu=dataclasses.replace(state.adam.nu, gaussians=new_gadam.nu),
            count=dataclasses.replace(state.adam.count, gaussians=new_gadam.count),
        )
        return (
            dataclasses.replace(
                state, params=new_params, adam=new_adam, aux=new_aux
            ),
            diag,
        )

    return densify_fn


def make_reset_opacity_fn():
    @jax.jit
    def reset_fn(state: TrainState):
        g_adam = AdamState(
            mu=state.adam.mu.gaussians,
            nu=state.adam.nu.gaussians,
            count=state.adam.count.gaussians,
        )
        new_g, new_gadam = reset_opacity(state.params.gaussians, g_adam)
        return dataclasses.replace(
            state,
            params=dataclasses.replace(state.params, gaussians=new_g),
            adam=AdamState(
                mu=dataclasses.replace(state.adam.mu, gaussians=new_gadam.mu),
                nu=dataclasses.replace(state.adam.nu, gaussians=new_gadam.nu),
                count=state.adam.count,
            ),
        )

    return reset_fn
