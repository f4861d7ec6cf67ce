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
            out["overflow"] = jax.lax.psum(out["overflow"], tile_axis)
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
