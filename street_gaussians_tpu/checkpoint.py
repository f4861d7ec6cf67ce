"""Checkpointing + PLY export.

Two artifact kinds, mirroring the reference (SURVEY.md §5):
  1. full training state (params + Adam moments + densification stats +
     step) — orbax pytree checkpoints under
     `trained_model/iteration_N` replacing the reference's
     `iteration_N.pth` torch.save (ref: train.py:218-223,
     lib/models/street_gaussian_model.py:138-159);
  2. multi-element PLY snapshots `point_cloud/iteration_N/point_cloud.ply`
     with one `vertex_<model>` element per sub-model for SIBR-viewer
     parity (ref: street_gaussian_model.py:94-117).

Because the TPU design keeps everything at fixed capacity, a checkpoint
is a plain pytree — no optimizer-state surgery on load.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from street_gaussians_tpu.models import gaussians as G
from street_gaussians_tpu.utils import ply as ply_utils


def search_max_iteration(folder: str) -> Optional[int]:
    """(ref: lib/utils/system_utils.py:26-28)"""
    if not os.path.isdir(folder):
        return None
    iters = []
    for name in os.listdir(folder):
        m = re.search(r"iteration_(\d+)", name)
        if m:
            iters.append(int(m.group(1)))
    return max(iters) if iters else None


def save_train_state(ckpt_dir: str, iteration: int, state) -> None:
    path = os.path.abspath(os.path.join(ckpt_dir, f"iteration_{iteration}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    if jax.process_count() > 1:
        # single-writer save under jax.distributed: restrict orbax's
        # barrier set to the calling process — the default barrier spans
        # ALL processes and deadlocks when only the writer saves
        # (runner.training gates this call on process_index() == 0)
        ckptr = ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}
            ),
        )
        with ckptr:
            ckptr.save(path, jax.device_get(state), force=True)
        return
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def load_train_state(ckpt_dir: str, template, iteration: Optional[int] = None):
    """Restore a TrainState; template provides structure/dtypes.
    Returns (state, iteration) or (None, 0) when nothing to resume."""
    if iteration is None:
        iteration = search_max_iteration(ckpt_dir)
    if iteration is None:
        return None, 0
    path = os.path.abspath(os.path.join(ckpt_dir, f"iteration_{iteration}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(template))
    # back-compat: pre-round-4 checkpoints stored the sky cubemap as
    # [6, R, R, 3] faces; the parameter is now channel-major [3, 6*R*R]
    # (models/sky_cubemap.py SkyParams). Convert every sky-shaped leaf
    # (params + both Adam moments share the structure).
    def _fix(path, leaf):
        # scoped to sky subtrees (params.sky / adam moments share the
        # structure) so a coincidentally [6, *, *, 3]-shaped leaf
        # elsewhere in the state is never transposed
        in_sky = any(
            getattr(p, "name", None) == "sky"
            or getattr(p, "key", None) == "sky"
            for p in path
        )
        if (
            in_sky
            and getattr(leaf, "ndim", 0) == 4
            and leaf.shape[0] == 6
            and leaf.shape[-1] == 3
        ):
            import numpy as _np

            return _np.transpose(_np.asarray(leaf).reshape(-1, 3), (1, 0))
        return leaf

    sky = getattr(getattr(restored, "params", None), "sky", None)
    if sky is not None:
        restored = jax.tree_util.tree_map_with_path(_fix, restored)
    return jax.device_put(restored), iteration


def gaussians_to_ply_elements(params: G.GaussianParams, aux: G.GaussianAux, table: G.SceneTable):
    """Pack alive rows of every sub-model into PLY structured arrays with
    the reference's attribute list (ref: gaussian_model.py:80-103,
    construct_list_of_attributes); element names `vertex_<model>`
    (street_gaussian_model.py:94-105)."""
    xyz = np.asarray(params.xyz)
    # flatten [C, Fdim, 3] -> reference layout f_dc_{c*Fdim + k} (features
    # stored [N, C_time, 3] and transposed on export)
    f_dc = np.asarray(params.feat_dc).transpose(0, 2, 1).reshape(xyz.shape[0], -1)
    f_rest = np.asarray(params.feat_rest).transpose(0, 2, 1).reshape(xyz.shape[0], -1)
    opacity = np.asarray(params.opacity_logit)
    scale = np.asarray(params.log_scale)
    rot = np.asarray(params.rot)
    semantic = np.asarray(params.semantic)
    alive = np.asarray(aux.alive)

    elements = {}
    for mi, name in enumerate(table.names):
        s, e = table.slices[mi]
        m = alive[s:e]
        fields = (
            [(k, "f4") for k in ("x", "y", "z", "nx", "ny", "nz")]
            + [(f"f_dc_{i}", "f4") for i in range(f_dc.shape[1])]
            + [(f"f_rest_{i}", "f4") for i in range(f_rest.shape[1])]
            + [("opacity", "f4")]
            + [(f"scale_{i}", "f4") for i in range(3)]
            + [(f"rot_{i}", "f4") for i in range(4)]
            + [(f"semantic_{i}", "f4") for i in range(semantic.shape[1])]
        )
        n = int(m.sum())
        arr = np.zeros(n, dtype=fields)
        sel = np.where(m)[0] + s
        arr["x"], arr["y"], arr["z"] = xyz[sel, 0], xyz[sel, 1], xyz[sel, 2]
        for i in range(f_dc.shape[1]):
            arr[f"f_dc_{i}"] = f_dc[sel, i]
        for i in range(f_rest.shape[1]):
            arr[f"f_rest_{i}"] = f_rest[sel, i]
        arr["opacity"] = opacity[sel, 0]
        for i in range(3):
            arr[f"scale_{i}"] = scale[sel, i]
        for i in range(4):
            arr[f"rot_{i}"] = rot[sel, i]
        for i in range(semantic.shape[1]):
            arr[f"semantic_{i}"] = semantic[sel, i]
        elements[f"vertex_{name}"] = arr
    return elements


def save_point_cloud(dirpath: str, iteration: int, params, aux, table) -> str:
    out_dir = os.path.join(dirpath, f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "point_cloud.ply")
    ply_utils.write_ply(path, gaussians_to_ply_elements(params, aux, table))
    return path


def load_point_cloud_into(
    path: str, params: G.GaussianParams, aux: G.GaussianAux, table: G.SceneTable
) -> Tuple[G.GaussianParams, G.GaussianAux]:
    """Load a multi-element PLY back into packed buffers (viewer/export
    round-trip; training resume uses the orbax state instead)."""
    import jax.numpy as jnp
    import dataclasses

    elems = ply_utils.read_ply(path)
    xyz = np.asarray(params.xyz).copy()
    f_dc = np.asarray(params.feat_dc).copy()
    f_rest = np.asarray(params.feat_rest).copy()
    log_scale = np.asarray(params.log_scale).copy()
    rot = np.asarray(params.rot).copy()
    opacity = np.asarray(params.opacity_logit).copy()
    semantic = np.asarray(params.semantic).copy()
    alive = np.zeros(table.capacity, bool)

    Fdim = f_dc.shape[1]
    K1 = f_rest.shape[1]
    for mi, name in enumerate(table.names):
        v = elems.get(f"vertex_{name}")
        if v is None:
            continue
        s, e = table.slices[mi]
        n = min(len(v), e - s)
        sl = slice(s, s + n)
        xyz[sl] = np.stack([v["x"][:n], v["y"][:n], v["z"][:n]], axis=-1)
        dc_cols = [c for c in v.dtype.names if c.startswith("f_dc_")]
        dc = np.stack([v[c][:n] for c in dc_cols], axis=-1)
        f_dc[sl] = dc.reshape(n, 3, Fdim).transpose(0, 2, 1)
        rest_cols = [c for c in v.dtype.names if c.startswith("f_rest_")]
        if rest_cols:
            rest = np.stack([v[c][:n] for c in rest_cols], axis=-1)
            f_rest[sl] = rest.reshape(n, 3, K1).transpose(0, 2, 1)
        opacity[sl, 0] = v["opacity"][:n]
        log_scale[sl] = np.stack([v[f"scale_{i}"][:n] for i in range(3)], axis=-1)
        rot[sl] = np.stack([v[f"rot_{i}"][:n] for i in range(4)], axis=-1)
        sem_cols = [c for c in v.dtype.names if c.startswith("semantic_")]
        if sem_cols:
            semantic[sl, : len(sem_cols)] = np.stack(
                [v[c][:n] for c in sem_cols], axis=-1
            )
        alive[s : s + n] = True

    new_params = G.GaussianParams(
        xyz=jnp.asarray(xyz),
        feat_dc=jnp.asarray(f_dc),
        feat_rest=jnp.asarray(f_rest),
        log_scale=jnp.asarray(log_scale),
        rot=jnp.asarray(rot),
        opacity_logit=jnp.asarray(opacity),
        semantic=jnp.asarray(semantic),
    )
    new_aux = dataclasses.replace(aux, alive=jnp.asarray(alive))
    return new_params, new_aux
