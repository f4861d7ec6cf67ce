"""Tile binning: turn per-Gaussian tile rects into fixed-capacity,
depth-ordered per-tile index lists — the TPU-native replacement for the
reference's cub prefix-scan + duplicateWithKeys + 64-bit radix sort
(ref: cuda_rasterizer/rasterizer_impl.cu:70-138, 197-343).

Everything here is static-shape:
  * `instance_capacity` bounds the total number of (gaussian, tile)
    instances per frame (overflow instances are dropped, counted in
    `overflow`).
  * `tile_capacity` bounds the per-tile list length (farthest instances
    beyond capacity are dropped — they are the most-occluded ones).

Design: Gaussians are depth-sorted first; instances are then generated
in depth order by a gather (searchsorted over cumulative rect sizes —
no scatter needed) and stable-sorted by tile id, so each tile's slice is
automatically depth-ordered.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from street_gaussians_tpu.ops.preprocess import GaussianScreenData


class TileBinning(NamedTuple):
    # [num_tiles, tile_capacity] gaussian index (into the original,
    # pre-sort numbering); -1 for empty slots.
    tile_gauss: jnp.ndarray
    # [num_tiles] number of valid entries per tile (<= tile_capacity)
    tile_count: jnp.ndarray
    # scalar diagnostics
    num_instances: jnp.ndarray  # total instances generated (pre-drop)
    overflow: jnp.ndarray  # instances dropped (instance or tile capacity)


def bin_gaussians(
    screen: GaussianScreenData,
    grid_x: int,
    grid_y: int,
    instance_capacity: int,
    tile_capacity: int,
) -> TileBinning:
    num_tiles = grid_x * grid_y

    # ---- depth sort the gaussians (invalid last) ----
    sort_depth = jnp.where(screen.valid, screen.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)  # [N]
    cnt = screen.tiles_touched[order]  # [N], 0 for invalid
    rmin = screen.rect_min[order]  # [N, 2]
    rwidth = (screen.rect_max[:, 0] - screen.rect_min[:, 0])[order]  # [N]

    offs = jnp.cumsum(cnt) - cnt  # exclusive prefix sum
    total = offs[-1] + cnt[-1]

    # ---- instance generation by gather ----
    # slot s belongs to sorted-gaussian g(s) = last g with offs[g] <= s
    s = jnp.arange(instance_capacity, dtype=jnp.int32)
    g = jnp.searchsorted(offs, s, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, cnt.shape[0] - 1)
    k = s - offs[g]
    w = jnp.maximum(rwidth[g], 1)
    tx = rmin[g, 0] + k % w
    ty = rmin[g, 1] + k // w
    inst_valid = s < total
    tile_id = jnp.where(inst_valid, ty * grid_x + tx, num_tiles).astype(jnp.int32)
    gauss_id = jnp.where(inst_valid, order[g], -1).astype(jnp.int32)

    # ---- stable sort instances by tile (preserves depth order per tile) ----
    sorted_tile, sorted_gauss = jax.lax.sort(
        (tile_id, gauss_id), num_keys=1, is_stable=True
    )

    # ---- per-tile ranges + ranks ----
    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts_all = tile_start[1:] - tile_start[:-1]  # [num_tiles]
    rank = jnp.arange(instance_capacity, dtype=jnp.int32) - tile_start[
        jnp.clip(sorted_tile, 0, num_tiles - 1)
    ]
    keep = (sorted_tile < num_tiles) & (rank < tile_capacity)

    # scatter into the padded [num_tiles, tile_capacity] table
    tile_gauss = jnp.full((num_tiles, tile_capacity), -1, jnp.int32)
    tile_gauss = tile_gauss.at[
        jnp.where(keep, sorted_tile, num_tiles),
        jnp.where(keep, rank, 0),
    ].set(jnp.where(keep, sorted_gauss, -1), mode="drop")

    tile_count = jnp.minimum(counts_all, tile_capacity)
    instance_overflow = jnp.maximum(total - instance_capacity, 0)
    tile_overflow = jnp.sum(jnp.maximum(counts_all - tile_capacity, 0))
    return TileBinning(
        tile_gauss=tile_gauss,
        tile_count=tile_count,
        num_instances=total,
        overflow=instance_overflow + tile_overflow,
    )
