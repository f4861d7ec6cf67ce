"""Packed fixed-capacity Gaussian scene state.

TPU-native replacement for the reference's scene graph of per-model
`nn.Module` clouds (`GaussianModel` lib/models/gaussian_model.py:17,
`GaussianModelBkgd`, `GaussianModelActor`, composed by
`StreetGaussianModel` lib/models/street_gaussian_model.py:29): instead
of one dynamically-sized tensor set per sub-model, ALL Gaussians of a
scene live in one set of packed arrays of static capacity, where each
sub-model owns a contiguous slice. A per-row `model_id` plus a small
per-model table (`SceneTable`) replace the name->module registry, so

  * the render path is one vectorized preprocess over the whole packed
    buffer (no per-object Python loop as in street_gaussian_model.py:243-285),
  * densify/clone/split/prune become masked scatters at static shape
    (XLA never recompiles as counts change),
  * per-model learning rates / thresholds are row gathers from the table.

Model 0 is the background; models 1..M-1 are tracked actors whose xyz /
rotation are in the canonical box frame (ref:
lib/models/gaussian_model_actor.py:31-49).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.utils import knn as knn_utils
from street_gaussians_tpu.utils import sh as sh_utils


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """The learnable pytree. All leading dims = capacity C.

    Matches the reference parameter set (_xyz/_features_dc/_features_rest/
    _scaling/_rotation/_opacity/_semantic, gaussian_model.py:39-45), with
    feat_dc carrying `fourier_dim` time coefficients for 4D actor
    appearance (gaussian_model_actor.py:71-80); the background uses only
    coefficient 0.
    """

    xyz: jnp.ndarray  # [C, 3]
    feat_dc: jnp.ndarray  # [C, Fdim, 3]
    feat_rest: jnp.ndarray  # [C, K-1, 3] higher SH bands
    log_scale: jnp.ndarray  # [C, 3]
    rot: jnp.ndarray  # [C, 4] unnormalized quaternion (w, x, y, z)
    opacity_logit: jnp.ndarray  # [C, 1]
    semantic: jnp.ndarray  # [C, S] (S = 1 when semantics are off)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianAux:
    """Non-learnable per-row state (alive mask + densification stats,
    ref: gaussian_model.py:46-48 max_radii2D/xyz_gradient_accum/denom)."""

    alive: jnp.ndarray  # [C] bool
    model_id: jnp.ndarray  # [C] int32
    grad_accum: jnp.ndarray  # [C, 2]: norm-grad col 0, abs-grad col 1 (AbsGS)
    denom: jnp.ndarray  # [C]
    max_radii: jnp.ndarray  # [C] max 2D radius seen since last densify


@dataclasses.dataclass(frozen=True)
class SceneTable:
    """Static per-model metadata. Python lists/np arrays describe layout
    (shapes, slices — static under jit); jnp arrays are gathered per-row
    inside jit. M = number of models (background + actors)."""

    names: List[str]  # model names: 'background', 'obj_017', ...
    slices: np.ndarray  # [M, 2] int (start, end) row ranges, static
    capacity: int  # total rows C

    # jnp per-model arrays (gather by model_id inside jit)
    track_id: jnp.ndarray  # [M] int32 (-1 background, -2 sky)
    class_label: jnp.ndarray  # [M] int32 semantic class (0 for background)
    deformable: jnp.ndarray  # [M] bool
    random_init: jnp.ndarray  # [M] bool (actor initialized from random grid)
    start_frame: jnp.ndarray  # [M] int32 (background: 0)
    end_frame: jnp.ndarray  # [M] int32 (background: large)
    extent: jnp.ndarray  # [M] densification extent (bkgd: scene_radius)
    spatial_lr_scale: jnp.ndarray  # [M]
    flip_prob: jnp.ndarray  # [M] (0 for background / deformable)
    bbox_half: jnp.ndarray  # [M, 3] actor half-extents (0 for background)
    fourier_scale: float

    # static scalars
    scene_center: np.ndarray  # [3]
    scene_radius: float
    sphere_center: np.ndarray  # [3]
    sphere_radius: float
    sh_degree_bkgd: int
    sh_degree_obj: int
    fourier_dim: int
    num_classes: int
    use_semantic: bool
    # index of the optional sky-as-Gaussians model (always last; the
    # dormant GaussinaModelSky capability, ref:
    # lib/models/gaussian_model_sky.py:10-125), or -1
    sky_model: int = -1

    @property
    def num_models(self) -> int:
        return len(self.names)

    @property
    def num_actors(self) -> int:
        return self.num_models - 1 - (1 if self.sky_model >= 0 else 0)

    def model_index(self, name: str) -> int:
        return self.names.index(name)

    def slice_of(self, name: str):
        s, e = self.slices[self.model_index(name)]
        return int(s), int(e)

    def sh_degree_per_model(self) -> np.ndarray:
        return np.array(
            [self.sh_degree_bkgd] + [self.sh_degree_obj] * (self.num_models - 1),
            np.int32,
        )


def _round_up(n: int, r: int) -> int:
    return ((n + r - 1) // r) * r


def make_actor_grid_points(bbox: np.ndarray, points_dim: int = 20):
    """Random-init actor cloud: a points_dim^3 grid filling the bbox with
    random colors (ref: gaussian_model_actor.py:97-110)."""
    lin = np.linspace(-1.0, 1.0, points_dim)
    gx, gy, gz = np.meshgrid(lin, lin, lin)
    xyz = np.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], axis=-1)
    xyz = xyz * (np.asarray(bbox) / 2.0)
    rgb = np.random.rand(*xyz.shape).astype(np.float32)
    return xyz.astype(np.float32), rgb


def mirror_points(xyz: np.ndarray, rgb: np.ndarray, axis: int = 1):
    """Symmetry-prior init: reflect the dominant side across `axis`
    (ref: gaussian_model_actor.py:111-125)."""
    pos = xyz[:, axis] > 0
    neg = xyz[:, axis] < 0
    part = pos if pos.sum() >= neg.sum() else neg
    flip_xyz = xyz[part].copy()
    flip_xyz[:, axis] *= -1
    return (
        np.concatenate([xyz, flip_xyz], axis=0),
        np.concatenate([rgb, rgb[part]], axis=0),
    )


def pack_scene(
    model_points: Dict[str, np.ndarray],
    model_colors: Dict[str, np.ndarray],
    obj_meta: Optional[Dict] = None,
    scene_center=np.zeros(3),
    scene_radius: float = 20.0,
    sphere_center=np.zeros(3),
    sphere_radius: float = 20.0,
    sh_degree_bkgd: int = 3,
    sh_degree_obj: int = 3,
    fourier_dim: int = 1,
    fourier_scale: float = 1.0,
    flip_prob: float = 0.0,
    num_classes: int = 20,
    use_semantic: bool = False,
    background_growth: float = 4.0,
    actor_growth: float = 4.0,
    round_to: int = 256,
    box_scale: float = 1.0,
    spatial_lr_scale_bkgd: Optional[float] = None,
    sky_points: Optional[np.ndarray] = None,
    sky_colors: Optional[np.ndarray] = None,
):
    """Pack initial per-model point clouds into (params, aux, table).

    model_points / model_colors: {'background': [N,3], 'obj_017': ...};
    actor points are in the canonical box frame.
    obj_meta: {track_id: {class_label, deformable, start_frame, end_frame,
               length, width, height, random_init?}} — same fields the
    reference parses (gaussian_model_actor.py:19-49).

    Initialization matches gaussian_model.py:54-78: SH-DC from RGB,
    log-sqrt-3NN scales, identity rotation, opacity 0.1.
    """
    obj_meta = obj_meta or {}
    names = ["background"] + [n for n in model_points.keys() if n != "background"]
    if sky_points is not None:
        # sky-as-Gaussians model, always last (gaussian_model_sky.py)
        model_points = dict(model_points)
        model_colors = dict(model_colors)
        model_points["sky"] = np.asarray(sky_points, np.float32)
        model_colors["sky"] = np.asarray(sky_colors, np.float32)
        names = [n for n in names if n != "sky"] + ["sky"]

    # per-model capacity slices
    slices = []
    cursor = 0
    for name in names:
        n = model_points[name].shape[0]
        growth = background_growth if name == "background" else actor_growth
        cap = _round_up(max(int(n * growth), round_to), round_to)
        slices.append((cursor, cursor + cap))
        cursor += cap
    capacity = cursor
    slices = np.array(slices, np.int64)

    K = (max(sh_degree_bkgd, sh_degree_obj) + 1) ** 2
    S = num_classes if use_semantic else 1
    Fdim = max(fourier_dim, 1)

    xyz = np.zeros((capacity, 3), np.float32)
    feat_dc = np.zeros((capacity, Fdim, 3), np.float32)
    feat_rest = np.zeros((capacity, K - 1, 3), np.float32)
    log_scale = np.full((capacity, 3), -10.0, np.float32)
    rot = np.zeros((capacity, 4), np.float32)
    rot[:, 0] = 1.0
    opacity_logit = np.full((capacity, 1), -10.0, np.float32)
    semantic = np.zeros((capacity, S), np.float32)
    alive = np.zeros((capacity,), bool)
    model_id = np.zeros((capacity,), np.int32)

    track_id, class_label, deformable, random_init = [], [], [], []
    start_frame, end_frame, extent, sls, fprob, bbox_half = [], [], [], [], [], []

    for mi, name in enumerate(names):
        s, e = slices[mi]
        model_id[s:e] = mi
        pts = np.asarray(model_points[name], np.float32)
        cols = np.asarray(model_colors[name], np.float32)
        n = pts.shape[0]
        xyz[s : s + n] = pts
        feat_dc[s : s + n, 0] = sh_utils.rgb_to_sh(cols)
        if n > 0:
            log_scale[s : s + n] = knn_utils.initial_log_scales(pts)
        opacity_logit[s : s + n] = inverse_sigmoid(0.1)
        alive[s : s + n] = True

        if name == "background":
            track_id.append(-1)
            class_label.append(0)
            deformable.append(False)
            random_init.append(False)
            start_frame.append(0)
            end_frame.append(1 << 30)
            extent.append(scene_radius)
            sls.append(
                scene_radius if spatial_lr_scale_bkgd is None else spatial_lr_scale_bkgd
            )
            fprob.append(0.0)
            bbox_half.append([0.0, 0.0, 0.0])
        elif name == "sky":
            # spatial scale / extent = sphere radius (gaussian_model_sky.py:35)
            track_id.append(-2)
            class_label.append(0)
            deformable.append(False)
            random_init.append(False)
            start_frame.append(0)
            end_frame.append(1 << 30)
            extent.append(sphere_radius)
            sls.append(sphere_radius)
            fprob.append(0.0)
            bbox_half.append([0.0, 0.0, 0.0])
        else:
            tid = int(name.split("_")[-1])
            meta = obj_meta.get(tid, {})
            length = float(meta.get("length", 4.0))
            width = float(meta.get("width", 2.0))
            height = float(meta.get("height", 1.6))
            # actor extent (ref: gaussian_model_actor.py:44-46)
            ext = max(length * 1.5 / box_scale, width * 1.5 / box_scale, height) / 2.0
            deform = bool(meta.get("deformable", False))
            track_id.append(tid)
            class_label.append(int(meta.get("class_label", 0)))
            deformable.append(deform)
            random_init.append(bool(meta.get("random_init", False)))
            start_frame.append(int(meta.get("start_frame", 0)))
            end_frame.append(int(meta.get("end_frame", 1 << 30)))
            extent.append(ext)
            sls.append(ext)
            fprob.append(0.0 if deform else flip_prob)
            bbox_half.append([length / 2.0, width / 2.0, height / 2.0])

    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        feat_dc=jnp.asarray(feat_dc),
        feat_rest=jnp.asarray(feat_rest),
        log_scale=jnp.asarray(log_scale),
        rot=jnp.asarray(rot),
        opacity_logit=jnp.asarray(opacity_logit),
        semantic=jnp.asarray(semantic),
    )
    aux = GaussianAux(
        alive=jnp.asarray(alive),
        model_id=jnp.asarray(model_id),
        grad_accum=jnp.zeros((capacity, 2), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        max_radii=jnp.zeros((capacity,), jnp.float32),
    )
    table = SceneTable(
        names=names,
        slices=slices,
        capacity=capacity,
        track_id=jnp.asarray(np.array(track_id, np.int32)),
        class_label=jnp.asarray(np.array(class_label, np.int32)),
        deformable=jnp.asarray(np.array(deformable, bool)),
        random_init=jnp.asarray(np.array(random_init, bool)),
        start_frame=jnp.asarray(np.array(start_frame, np.int32)),
        end_frame=jnp.asarray(np.array(end_frame, np.int32)),
        extent=jnp.asarray(np.array(extent, np.float32)),
        spatial_lr_scale=jnp.asarray(np.array(sls, np.float32)),
        flip_prob=jnp.asarray(np.array(fprob, np.float32)),
        bbox_half=jnp.asarray(np.array(bbox_half, np.float32)),
        fourier_scale=float(fourier_scale),
        scene_center=np.asarray(scene_center, np.float32),
        scene_radius=float(scene_radius),
        sphere_center=np.asarray(sphere_center, np.float32),
        sphere_radius=float(sphere_radius),
        sh_degree_bkgd=int(sh_degree_bkgd),
        sh_degree_obj=int(sh_degree_obj),
        fourier_dim=Fdim,
        num_classes=num_classes,
        use_semantic=use_semantic,
        sky_model=(len(names) - 1) if sky_points is not None else -1,
    )
    return params, aux, table


# ---------------------------------------------------------------------------
# activations (ref: gaussian_model.py:207-222 setup_functions)
# ---------------------------------------------------------------------------


def get_scaling(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.log_scale)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity_logit)


def get_rotation(params: GaussianParams) -> jnp.ndarray:
    n = jnp.linalg.norm(params.rot, axis=-1, keepdims=True)
    return params.rot / jnp.maximum(n, 1e-12)


def scale_flatten_loss(params: GaussianParams, alive: jnp.ndarray) -> jnp.ndarray:
    """Flatten regularizer over alive Gaussians: push the smallest axis
    to zero and the two large axes toward each other
    (ref: gaussian_model.py:271-280; dormant — lambda_scale_flatten
    defaults to 0 and the reference loop never calls it)."""
    scales = jnp.exp(params.log_scale)
    s = jnp.sort(scales, axis=1)
    s1 = jnp.clip(s[:, 0], 0.0, 30.0)
    s2 = jnp.clip(s[:, 1], 1e-5, 30.0)
    s3 = jnp.clip(s[:, 2], 1e-5, 30.0)
    per_row = jnp.abs(s1) + jnp.abs(s2 / s3 + s3 / s2 - 2.0)
    w = alive.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def box_reg_loss(params: GaussianParams, aux, table: SceneTable) -> jnp.ndarray:
    """Actor scale-vs-box regularizer averaged over actors
    (ref: gaussian_model_actor.py:266-271, street_gaussian_model.py:588-595),
    percent_dense = 0.01."""
    if table.num_actors == 0:
        return jnp.zeros(())
    mid = aux.model_id
    is_actor = (mid > 0) & (table.track_id[mid] >= 0) & aux.alive
    ext = table.extent[mid]
    smax = jnp.max(jnp.exp(params.log_scale), axis=1)
    smax = jnp.where(smax > ext * 0.01, smax, 0.0)
    per_row = smax / jnp.maximum(ext, 1e-6)
    # per-actor mean, then mean over actors
    sums = jax.ops.segment_sum(
        jnp.where(is_actor, per_row, 0.0), mid, num_segments=table.num_models
    )
    cnts = jax.ops.segment_sum(
        is_actor.astype(jnp.float32), mid, num_segments=table.num_models
    )
    means = sums / jnp.maximum(cnts, 1.0)
    actor_mask = (jnp.arange(table.num_models) > 0) & (table.track_id >= 0)
    return jnp.sum(jnp.where(actor_mask, means, 0.0)) / jnp.maximum(
        jnp.sum(actor_mask), 1
    )


def active_sh_degree(step, max_degree: int):
    """SH degree ramp: +1 every 1000 iters up to max
    (ref: train.py:70-71, gaussian_model.py:282-284)."""
    return jnp.minimum(step // 1000, max_degree)


def sh_band_mask(active_degree, max_degree: int) -> jnp.ndarray:
    """[K-1] mask over feat_rest bands: band l coefficients enabled when
    active_degree >= l. Multiplying masked coefficients keeps them (and
    their gradients) at zero — equivalent to the reference's truncated
    eval at active_sh_degree."""
    K = (max_degree + 1) ** 2
    idx = jnp.arange(1, K)
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (band <= active_degree).astype(jnp.float32)
