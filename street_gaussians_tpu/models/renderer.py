"""Composite scene-graph renderer.

TPU-native equivalent of `StreetGaussianRenderer`
(ref: lib/models/street_gaussian_renderer.py:7-280) +
`StreetGaussianModel`'s concatenated getters
(ref: lib/models/street_gaussian_model.py:287-480): one vectorized
compose over the packed Gaussian buffer (per-row gathers of per-model
pose/metadata replace the per-object Python loop), then the
preprocess -> binning -> Pallas tile-blend pipeline, then sky cubemap
compositing and color correction.

Every Gaussian lives in the packed arrays at all times; per-frame
visibility (actor lifetime, include/exclude subsets for
render_object / render_background) is expressed through the `alive`
mask fed to the rasterizer cull — shapes never change.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.models import gaussians as G
from street_gaussians_tpu.models.actor_pose import (
    ActorInterp,
    ActorPoseData,
    ActorPoseParams,
    actor_poses,
)
from street_gaussians_tpu.models.corrections import (
    ColorCorrectionParams,
    PoseCorrectionParams,
    apply_color_correction,
    correct_gaussian_rotation,
    correct_gaussian_xyz,
)
from street_gaussians_tpu.models.sky_cubemap import SkyParams, render_sky
from street_gaussians_tpu.ops.preprocess import preprocess_gaussians
from street_gaussians_tpu.ops.rasterize import RasterizeConfig, rasterize
from street_gaussians_tpu.utils import sh as sh_utils
from street_gaussians_tpu.utils.camera import CameraJax
from street_gaussians_tpu.utils.quaternion import (
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
)

# 180-degree rotation about the flip axis (y) as a quaternion — the
# reference's flip_matrix (street_gaussian_model.py:59-61).
FLIP_QUAT = jnp.array([0.0, 0.0, 1.0, 0.0], jnp.float32)
FLIP_AXIS = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneParams:
    """Every learnable leaf of the full model, as one pytree."""

    gaussians: G.GaussianParams
    actor_pose: Optional[ActorPoseParams]
    sky: Optional[SkyParams]
    color_correction: Optional[ColorCorrectionParams]
    pose_correction: Optional[PoseCorrectionParams]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameInput:
    """Per-camera device inputs for one render."""

    cam: CameraJax
    ego_quat: jnp.ndarray  # [4] ego rotation quaternion
    ego_rotmat: jnp.ndarray  # [3, 3]
    ego_trans: jnp.ndarray  # [3]
    interp: Optional[ActorInterp]  # None when the scene has no actors


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static render configuration (shapes/branches under jit)."""

    mode: str = "train"  # 'train' enables flip augmentation + ray jitter
    render_normal: bool = False
    use_semantic: bool = False
    semantic_mode: str = "logits"
    white_background: bool = False
    scaling_modifier: float = 1.0
    tile_capacity: int = 1024
    instance_capacity: int = 2 ** 21
    max_tiles_per_gaussian: Optional[int] = None
    interpret: bool = False  # Pallas interpreter mode (CPU tests)
    # eval-only serving-path knob: sample the sky cubemap on a 1/N grid
    # and bilinear-upsample (sky is smooth at >= 1 px/texel; parity
    # bound measured in tests/test_fast_render.py + on TPU in
    # docs/perf_journal.md). 1 = off; ignored in train mode.
    sky_downsample: int = 1
    # per-tile ellipse corner cull (contributor-set-exact; see
    # RasterizeConfig.corner_cull)
    corner_cull: bool = True


def compose_frame(
    params: SceneParams,
    aux: G.GaussianAux,
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    frame_inp: FrameInput,
    step,
    include_mask: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    opts: RenderOptions = RenderOptions(),
):
    """World-space per-Gaussian attributes for one camera.

    include_mask: static [M] bool — sub-model selection for
    render_object / render_background (ref:
    street_gaussian_renderer.py:42-72 set_visibility + include_list).
    key: PRNG for the train-time symmetry flip
    (street_gaussian_model.py:276-285).

    Returns dict: means3d, scales, quats, opacity, shs, semantic,
    visible (all [C, ...]).
    """
    g = params.gaussians
    mid = aux.model_id
    frame = frame_inp.cam.frame
    M = table.num_models

    # --- per-row visibility (actor lifetime x include set x alive) ---
    in_range = (frame >= table.start_frame[mid]) & (frame <= table.end_frame[mid])
    visible = aux.alive & in_range
    if include_mask is not None:
        inc = jnp.asarray(np.asarray(include_mask, bool))
        visible = visible & inc[mid]

    is_actor_row = (mid > 0) & (table.track_id[mid] >= 0)
    n_sky = 1 if table.sky_model >= 0 else 0

    # --- actor world poses (one vectorized slerp over all actors) ---
    if table.num_actors > 0 and frame_inp.interp is not None:
        a_quat, a_trans = actor_poses(
            pose_data,
            params.actor_pose,
            frame_inp.interp,
            frame_inp.ego_quat,
            frame_inp.ego_rotmat,
            frame_inp.ego_trans,
        )  # [A, 4], [A, 3]
        ident = jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
        obj_quat = jnp.concatenate(
            [ident, a_quat] + [ident] * n_sky, axis=0
        )  # [M, 4]
        obj_trans = jnp.concatenate(
            [jnp.zeros((1, 3), jnp.float32), a_trans]
            + [jnp.zeros((1, 3), jnp.float32)] * n_sky,
            axis=0,
        )
    else:
        obj_quat = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32), (M, 4))
        obj_trans = jnp.zeros((M, 3), jnp.float32)

    mslices = tuple(tuple(int(v) for v in se) for se in table.slices)
    row_quat = rows_from_models(obj_quat, mid, mslices)  # [C, 4]
    row_trans = rows_from_models(obj_trans, mid, mslices)  # [C, 3]

    # --- symmetry flip augmentation (train only) ---
    xyz_local = g.xyz
    rot_local = g.rot
    if opts.mode == "train" and key is not None:
        # shape from the rows themselves, not table.capacity: under a
        # gauss-sharded shard_map (parallel/gauss.py) the local rows are
        # a 1/D slice of the packed buffer
        flip = jax.random.uniform(key, (g.xyz.shape[0],)) < table.flip_prob[mid]
        xyz_local = jnp.where(
            flip[:, None],
            xyz_local.at[:, FLIP_AXIS].multiply(-1.0),
            xyz_local,
        )
        rot_local = jnp.where(
            flip[:, None], quat_multiply(FLIP_QUAT[None, :], rot_local), rot_local
        )

    # --- local -> world (actors) / pose correction (background) ---
    xyz_world_actor = quat_rotate(row_quat, xyz_local) + row_trans
    rot_world_actor = quat_normalize(quat_multiply(row_quat, quat_normalize(rot_local)))

    if params.pose_correction is not None:
        pc_idx = frame_inp.cam.image_id
        xyz_bkgd = correct_gaussian_xyz(params.pose_correction, pc_idx, g.xyz)
        rot_bkgd = correct_gaussian_rotation(
            params.pose_correction, pc_idx, quat_normalize(g.rot)
        )
    else:
        xyz_bkgd = g.xyz
        rot_bkgd = quat_normalize(g.rot)

    means3d = jnp.where(is_actor_row[:, None], xyz_world_actor, xyz_bkgd)
    quats = jnp.where(is_actor_row[:, None], rot_world_actor, rot_bkgd)

    scales = jnp.exp(g.log_scale)
    if table.sky_model >= 0:
        # sky-as-Gaussians: project xyz to >= 2x sphere radius and clamp
        # scaling at the sphere radius (gaussian_model_sky.py:50-62)
        is_sky = mid == table.sky_model
        c = jnp.asarray(table.sphere_center)
        d = jnp.linalg.norm(means3d - c[None, :], axis=-1, keepdims=True)
        ratio = d / (2.0 * table.sphere_radius)
        xyz_sky = jnp.where(
            ratio < 1.0, c[None, :] + (means3d - c[None, :]) / jnp.maximum(ratio, 1e-6), means3d
        )
        means3d = jnp.where(is_sky[:, None], xyz_sky, means3d)
        scales = jnp.where(
            is_sky[:, None], jnp.minimum(scales, table.sphere_radius), scales
        )

    # --- 4D Fourier DC features (street_gaussian_model.py:365-380) ---
    t_norm = (frame - table.start_frame).astype(jnp.float32) / jnp.maximum(
        (table.end_frame - table.start_frame).astype(jnp.float32), 1.0
    )  # [M]
    t_row = (table.fourier_scale * t_norm)[mid]  # [C]
    basis = sh_utils.idft_basis(t_row, table.fourier_dim)  # [C, Fdim]
    # background rows use only coefficient 0 (their fourier_dim is 1)
    basis = jnp.where(
        is_actor_row[:, None],
        basis,
        jnp.zeros_like(basis).at[:, 0].set(1.0),
    )
    dc = jnp.einsum("cf,cfk->ck", basis, g.feat_dc)  # [C, 3]

    # --- SH band masking: per-model max degree + the global ramp ---
    max_deg = max(table.sh_degree_bkgd, table.sh_degree_obj)
    active = G.active_sh_degree(step, max_deg)
    deg_row = jnp.where(
        is_actor_row,
        jnp.minimum(active, table.sh_degree_obj),
        jnp.minimum(active, table.sh_degree_bkgd),
    )  # [C]
    K = (max_deg + 1) ** 2
    band = jnp.floor(jnp.sqrt(jnp.arange(1, K, dtype=jnp.float32))).astype(jnp.int32)
    rest_mask = (band[None, :] <= deg_row[:, None]).astype(jnp.float32)  # [C, K-1]
    rest = g.feat_rest * rest_mask[..., None]
    shs = jnp.concatenate([dc[:, None, :], rest], axis=1)  # [C, K, 3]

    # --- semantics (street_gaussian_model.py:416-433; actor one-channel
    # logits scattered into the class_label column,
    # gaussian_model_actor.py:62-69) ---
    semantic = None
    if opts.use_semantic:
        S = table.num_classes
        onehot = jax.nn.one_hot(table.class_label[mid], S, dtype=jnp.float32)
        obj_val = g.semantic[:, 0:1]
        if opts.semantic_mode == "probabilities":
            obj_val = jax.nn.sigmoid(obj_val)
        sem_actor = onehot * obj_val
        sem_bkgd = g.semantic[:, :S] if g.semantic.shape[1] >= S else jnp.pad(
            g.semantic, ((0, 0), (0, S - g.semantic.shape[1]))
        )
        semantic = jnp.where(is_actor_row[:, None], sem_actor, sem_bkgd)

    # --- normals from the min-scale axis, camera-facing (ref:
    # gaussian_model.py:256-269; actor normals use the composed world
    # rotation, street_gaussian_model.py:460-480) ---
    normals = None
    if opts.render_normal:
        R = quat_to_rotmat(quats)  # [C, 3, 3]
        min_axis = jnp.argmin(scales, axis=1)  # [C]
        normals = jnp.take_along_axis(
            R, min_axis[:, None, None].repeat(3, 1), axis=2
        )[..., 0]  # columns of R
        dir_pp = means3d - frame_inp.cam.cam_center[None, :]
        dir_pp = dir_pp / jnp.maximum(
            jnp.linalg.norm(dir_pp, axis=-1, keepdims=True), 1e-12
        )
        dot = jnp.sum(-dir_pp * normals, axis=-1, keepdims=True)
        normals = jnp.where(dot >= 0, normals, -normals)

    return dict(
        means3d=means3d,
        scales=scales,
        quats=quats,
        opacity=jax.nn.sigmoid(g.opacity_logit)[:, 0],
        shs=shs,
        semantic=semantic,
        normals=normals,
        visible=visible,
    )


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rows_from_models(per_model, mid, slices):
    """per_model[mid] with a scatter-free VJP.

    The plain gather's transpose is a scatter-add of [C, K] row
    cotangents into M slots, which XLA:TPU serializes (traced at
    ~5.8 ms per gather at 661k rows — fusion.26/24 in the round-3 bench
    trace). The packed layout makes it free instead: model m owns the
    STATIC contiguous row range slices[m], so d_per_model[m] is a plain
    slice-sum (runs at memory bandwidth). Sharded rows (parallel/gauss.py
    slices a 1/D block, so global slices don't align) fall back to a
    one-hot MXU matmul — still ~7x faster than the scatter.

    slices: static tuple of (start, end) per model (covering the rows).
    """
    return jnp.take(per_model, mid, axis=0)


def _rfm_fwd(per_model, mid, slices):
    return jnp.take(per_model, mid, axis=0), (mid, per_model.shape)


def _rfm_bwd(slices, res, d_rows):
    mid, pm_shape = res
    total = slices[-1][1]
    if d_rows.shape[0] == total and slices[0][0] == 0:
        d_pm = jnp.stack(
            [
                jnp.sum(d_rows[s:e], axis=0, dtype=jnp.float32)
                for s, e in slices
            ]
        )
    else:
        onehot = (
            mid[:, None] == jnp.arange(pm_shape[0], dtype=mid.dtype)[None, :]
        ).astype(d_rows.dtype)
        d_pm = jax.lax.dot_general(
            onehot,
            d_rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    return (d_pm, np.zeros(mid.shape, jax.dtypes.float0))


rows_from_models.defvjp(_rfm_fwd, _rfm_bwd)


def _upsample2x(img: jnp.ndarray) -> jnp.ndarray:
    """[h, w, 3] -> [2h, 2w, 3] bilinear with half-pixel alignment:
    out[2i] = 0.75 in[i] + 0.25 in[i-1], out[2i+1] = 0.75 in[i] +
    0.25 in[i+1] (clamped edges) per axis — bit-matches
    jax.image.resize('bilinear') at scale 2 but lowers to fused
    elementwise ops instead of a general gather-based resize."""

    def up(a, axis):
        def sl(s):
            idx = [slice(None)] * a.ndim
            idx[axis] = s
            return a[tuple(idx)]

        prev = jnp.concatenate([sl(slice(0, 1)), sl(slice(0, -1))], axis=axis)
        nxt = jnp.concatenate([sl(slice(1, None)), sl(slice(-1, None))], axis=axis)
        even = 0.75 * a + 0.25 * prev
        odd = 0.75 * a + 0.25 * nxt
        out = jnp.stack([even, odd], axis=axis + 1)
        shape = list(a.shape)
        shape[axis] *= 2
        return out.reshape(shape)

    return up(up(img, 0), 1)


def screen_space(
    params: SceneParams,
    aux: G.GaussianAux,
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    frame_inp: FrameInput,
    step,
    include_mask: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    opts: RenderOptions = RenderOptions(),
    mean2d_offset: Optional[jnp.ndarray] = None,
):
    """Per-Gaussian half of the render: compose + screen-space preprocess.

    This is the seam for Gaussian-sharded rendering (parallel/gauss.py):
    every row of the inputs maps independently to a row of the outputs,
    so the packed buffer can be sharded over a mesh axis here and the
    (much smaller) screen rows all-gathered for binning + blending.
    Returns (screen: GaussianScreenData, composed dict).
    """
    cam = frame_inp.cam
    composed = compose_frame(
        params, aux, table, pose_data, frame_inp, step, include_mask, key, opts
    )
    max_deg = max(table.sh_degree_bkgd, table.sh_degree_obj)
    screen = preprocess_gaussians(
        means3d=composed["means3d"],
        scales=composed["scales"],
        quats=composed["quats"],
        opacities=composed["opacity"],
        shs=composed["shs"],
        cam_w2c=cam.w2c,
        cam_full_proj=cam.full_proj,
        cam_center=cam.cam_center,
        H=cam.H,
        W=cam.W,
        focal_x=cam.focal_x,
        focal_y=cam.focal_y,
        tan_fovx=cam.tan_fovx,
        tan_fovy=cam.tan_fovy,
        sh_degree=max_deg,
        scale_modifier=opts.scaling_modifier,
        alive=composed["visible"],
        max_tiles_per_gaussian=opts.max_tiles_per_gaussian,
    )
    if mean2d_offset is not None:
        screen = screen._replace(mean2d=screen.mean2d + mean2d_offset)
    return screen, composed


def render_frame(
    params: SceneParams,
    aux: G.GaussianAux,
    table: G.SceneTable,
    pose_data: Optional[ActorPoseData],
    frame_inp: FrameInput,
    step,
    include_mask: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    opts: RenderOptions = RenderOptions(),
    compose_sky: bool = True,
    mean2d_offset: Optional[jnp.ndarray] = None,
    absgrad_dummy: Optional[jnp.ndarray] = None,
    row_shard=None,
    screen_composed=None,
    sky_jitter: Optional[jnp.ndarray] = None,
    sky_table: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full render of one camera -> dict rgb/acc/depth/T/semantic/radii...

    mean2d_offset: optional [C, 2] zeros; gradients w.r.t. it are the
    viewspace-position gradients used for densification (the functional
    analog of the reference's retain_grad screenspace_points tensor,
    street_gaussian_renderer.py:163-171).
    absgrad_dummy: optional [C, 2] zeros; its gradient carries the
    per-pixel-abs viewspace gradients (AbsGS, backward.cu:624-628).
    sky_jitter: optional [H_out, W, 2] train-time sub-pixel sky ray
    offsets supplied by the caller instead of drawn here — the
    tile-sharded TRAIN step (parallel/tiles.py) draws the full-image
    jitter once and slices each device's band so the sharded step's
    random draws match the single-device step bit-for-bit.
    sky_table: optional precomputed `build_sky_table(params.sky.cubemap)`
    — serving-only (parameters frozen, not differentiable): skips the
    per-frame sky window-table build, bit-identical output.
    """
    cam = frame_inp.cam
    if screen_composed is not None:
        # pre-built by the caller (parallel/gauss.py builds the screen
        # rows shard-local and all-gathers them before rasterizing)
        screen, composed = screen_composed
    else:
        screen, composed = screen_space(
            params, aux, table, pose_data, frame_inp, step, include_mask,
            key, opts, mean2d_offset,
        )

    # --- row(tile)-sharded rendering: restrict to this device's band of
    # tile rows (parallel/tiles.py). row_shard = (tile_row_start
    # [traced], num_tile_rows [static]); outputs then cover
    # num_tile_rows*16 image rows starting at tile_row_start*16. ---
    H_out = cam.H
    row_px0 = None
    if row_shard is not None:
        from street_gaussians_tpu.ops.preprocess import clip_screen_to_rows

        tile_row_start, num_tile_rows = row_shard
        screen = clip_screen_to_rows(screen, tile_row_start, num_tile_rows)
        H_out = num_tile_rows * 16
        row_px0 = tile_row_start * 16

    # extra blend channels: normals first, then semantics (the
    # reference's packing order, street_gaussian_renderer.py:206-227)
    extras = []
    if composed["normals"] is not None:
        extras.append(composed["normals"])
    if composed["semantic"] is not None:
        extras.append(composed["semantic"])
    extra_features = jnp.concatenate(extras, axis=-1) if extras else None

    bg = jnp.ones(3, jnp.float32) if opts.white_background else jnp.zeros(3, jnp.float32)
    out = rasterize(
        screen,
        H_out,
        cam.W,
        bg_color=bg,
        extra_features=extra_features,
        config=RasterizeConfig(
            # falsy tile_capacity = uncapped (same convention the config
            # path normalizes in runner.render_opts_from_cfg; without
            # this a direct RenderOptions(tile_capacity=0) user would
            # hit binning's `rank < 0` mask and get a blank render)
            tile_capacity=opts.tile_capacity or opts.instance_capacity,
            instance_capacity=opts.instance_capacity,
            interpret=opts.interpret,
            corner_cull=opts.corner_cull,
        ),
        absgrad_dummy=absgrad_dummy,
    )

    # --- sky compositing (street_gaussian_renderer.py:107-111) ---
    if compose_sky and params.sky is not None:
        jitter = sky_jitter
        if jitter is None and opts.mode == "train" and key is not None:
            jitter = (
                jax.random.uniform(
                    jax.random.fold_in(key, 1), (H_out, cam.W, 2)
                )
                - 0.5
            )
        ds = opts.sky_downsample if opts.mode != "train" else 1
        sky_rgb = render_sky(
            params.sky, cam, jitter=jitter, interpret=opts.interpret,
            row_start=row_px0, num_rows=H_out if row_shard is not None else None,
            downsample=ds, table=sky_table,
        )
        if ds == 2:
            # exact half-pixel-aligned 2x bilinear (same values as
            # jax.image.resize 'bilinear' at scale 2: weights 0.75/0.25)
            # as pure elementwise ops XLA fuses into the composite
            sky_rgb = _upsample2x(sky_rgb)[:H_out, : cam.W]
        elif ds > 1:
            sky_rgb = jax.image.resize(
                sky_rgb,
                (sky_rgb.shape[0] * ds, sky_rgb.shape[1] * ds, 3),
                method="bilinear",
            )[:H_out, : cam.W]
        out["rgb"] = out["rgb"] + sky_rgb * out["T"][..., None]

    # --- color correction (street_gaussian_renderer.py:113-114) ---
    if params.color_correction is not None:
        out["rgb"] = apply_color_correction(
            params.color_correction, cam.image_id, out["rgb"]
        )

    if opts.mode != "train":
        out["rgb"] = jnp.clip(out["rgb"], 0.0, 1.0)

    if "extra" in out and extras:
        planes = out.pop("extra")
        offset = 0
        if composed["normals"] is not None:
            n = planes[..., 0:3]
            out["normals"] = n / jnp.maximum(
                jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8
            )
            offset = 3
        if composed["semantic"] is not None:
            sem = planes[..., offset:]
            if opts.semantic_mode == "probabilities":
                sem = sem / (jnp.sum(sem, axis=-1, keepdims=True) + 1e-8)
                sem = jnp.log(sem + 1e-8)
            out["semantic"] = sem

    out["radii"] = screen.radius
    out["visibility"] = screen.radius > 0
    return out


def include_mask_for(
    table: G.SceneTable, include=None, exclude=None
) -> np.ndarray:
    """Static [M] bool from model-name include/exclude lists
    (ref: street_gaussian_model.py:474-480 set_visibility)."""
    m = np.ones(table.num_models, bool)
    if include is not None:
        m[:] = False
        for name in include:
            if name in table.names:
                m[table.model_index(name)] = True
    if exclude is not None:
        for name in exclude:
            if name in table.names:
                m[table.model_index(name)] = False
    return m


def render_object_mask(table: G.SceneTable) -> np.ndarray:
    """Objects only (ref: street_gaussian_renderer.py:42-56 render_object)."""
    m = np.ones(table.num_models, bool)
    m[0] = False
    if table.sky_model >= 0:
        m[table.sky_model] = False
    return m


def render_background_mask(table: G.SceneTable) -> np.ndarray:
    """Background only (ref: street_gaussian_renderer.py:58-72)."""
    m = np.zeros(table.num_models, bool)
    m[0] = True
    return m
