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
