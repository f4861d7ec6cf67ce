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

Design (all chosen for TPU memory behavior — no binary searches, no
key/value pair sorts):
  * Gaussians are depth-sorted once ([N] sort).
  * The instance->gaussian map is a cumsum over a scattered marker
    array (the searchsorted formulation costs tens of millions of
    random gathers on TPU).
  * Instances carry a single packed uint32 key
    [tile_id | gaussian-depth-rank]: sorting the one key array gives
    per-tile depth order directly, at half the payload of a stable
    (tile, gauss) pair sort. When N or the tile count exceed the 32-bit
    packing budget the code falls back to the pair sort.
  * Per-tile ranges come from a segment-sum + cumsum, not searchsorted.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.ops.preprocess import GaussianScreenData


class InstanceBinning(NamedTuple):
    """Instance-major binning (for ops/tile_raster2.py): each tile owns
    a contiguous RAGGED run [tile_start, tile_start + tile_count) of
    rows in the (tile, depth)-sorted instance array; the blend kernel
    masks boundary blocks by global row range, so the layout needs no
    alignment scatter.

    `inst_gauss` doubles as the backward's reduction key: the payload
    gather's VJP sorts the per-instance gradient rows by gaussian id and
    reduces each id-range with a banded-matmul segment sum
    (ops/segsum.py) instead of a contended scatter-add."""

    inst_gauss: jnp.ndarray  # [S] gaussian index per sorted slot, -1 dropped
    tile_count: jnp.ndarray  # [num_tiles] valid instances per tile (clamped)
    tile_start: jnp.ndarray  # [num_tiles] first sorted row of the tile's run
    num_instances: jnp.ndarray  # scalar: total generated (pre-drop)
    overflow: jnp.ndarray  # scalar: dropped instances (either cause)
    overflow_instance: jnp.ndarray  # scalar: dropped by instance_capacity
    overflow_tile: jnp.ndarray  # scalar: dropped by tile_capacity


def padded_slots(instance_capacity: int, num_tiles: int) -> int:
    """Static packed-slot count: every tile's run is padded to a
    multiple of 128, so worst case adds 127 slots per tile."""
    return instance_capacity + 128 * num_tiles


class TileBinning(NamedTuple):
    # [num_tiles, tile_capacity] gaussian index (into the original,
    # pre-sort numbering); -1 for empty slots.
    tile_gauss: jnp.ndarray
    # [num_tiles] number of valid entries per tile (<= tile_capacity)
    tile_count: jnp.ndarray
    # scalar diagnostics
    num_instances: jnp.ndarray  # total instances generated (pre-drop)
    overflow: jnp.ndarray  # instances dropped (instance or tile capacity)
    overflow_instance: jnp.ndarray  # dropped by instance_capacity
    overflow_tile: jnp.ndarray  # dropped by tile_capacity


def _fill_forward(values_by_rank, offs, cnt, instance_capacity):
    """Expand per-gaussian values to per-instance WITHOUT gathers.

    The instance->gaussian map is monotone (instances are generated in
    depth-rank order), so v[g(s)] equals a running sum of deltas
    scattered at each range's start position: XLA lowers per-instance
    gathers fused into this graph as scalar loops (~100x slower than the
    scatter+cumsum on TPU).

    values_by_rank: [N] int32; offs/cnt: [N]. Returns [S] int32.
    """
    prev = jnp.concatenate([jnp.zeros((1,), values_by_rank.dtype), values_by_rank[:-1]])
    delta = values_by_rank - prev
    pos = jnp.where(cnt > 0, offs, instance_capacity)
    buf = jnp.zeros((instance_capacity,), values_by_rank.dtype)
    buf = buf.at[pos].add(delta, mode="drop")
    return jnp.cumsum(buf)


def _sorted_instances(screen, grid_x, grid_y, instance_capacity):
    """Shared front half: depth sort, instance generation, tile sort.

    Returns (sorted_tile, sorted_gauss, counts_all [T], total)."""
    num_tiles = grid_x * grid_y
    n = screen.depth.shape[0]

    # ---- depth sort the gaussians (invalid last) ----
    sort_depth = jnp.where(screen.valid, screen.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)  # [N]
    # one consolidated row gather (4 fused scalar gathers would be slow)
    src = jnp.stack(
        [
            screen.tiles_touched,
            screen.rect_min[:, 0],
            screen.rect_min[:, 1],
            screen.rect_max[:, 0] - screen.rect_min[:, 0],
        ],
        axis=1,
    )  # [N, 4]
    srt = jnp.take(src, order, axis=0)
    cnt = srt[:, 0]
    rminx = srt[:, 1]
    rminy = srt[:, 2]
    rwidth = srt[:, 3]

    offs = jnp.cumsum(cnt) - cnt  # exclusive prefix sum
    total = offs[-1] + cnt[-1]

    # ---- per-instance values via delta fill-forward (gather-free) ----
    s = jnp.arange(instance_capacity, dtype=jnp.int32)
    ff = functools.partial(_fill_forward, offs=offs, cnt=cnt, instance_capacity=instance_capacity)
    offs_i = ff(offs)
    rminx_i = ff(rminx)
    rminy_i = ff(rminy)
    rwidth_i = jnp.maximum(ff(rwidth), 1)
    gauss_i = ff(order.astype(jnp.int32))
    started = jnp.cumsum(
        jnp.zeros((instance_capacity,), jnp.int32)
        .at[jnp.where(cnt > 0, offs, instance_capacity)]
        .add(1, mode="drop")
    )
    inst_valid = (s < total) & (started > 0)

    k = s - offs_i
    tx = rminx_i + k % rwidth_i
    ty = rminy_i + k // rwidth_i
    tile_id = jnp.where(inst_valid, ty * grid_x + tx, num_tiles).astype(jnp.int32)
    gauss_id = jnp.where(inst_valid, gauss_i, -1).astype(jnp.int32)

    # ---- per-tile counts ----
    counts_all = jax.ops.segment_sum(
        inst_valid.astype(jnp.int32), tile_id, num_segments=num_tiles + 1
    )[:num_tiles]

    # ---- stable sort by tile: preserves depth order within each tile ----
    sorted_tile, sorted_gauss = jax.lax.sort(
        (tile_id, gauss_id), num_keys=1, is_stable=True
    )
    return sorted_tile, sorted_gauss, counts_all, total


def bin_gaussians(
    screen: GaussianScreenData,
    grid_x: int,
    grid_y: int,
    instance_capacity: int,
    tile_capacity: int,
) -> TileBinning:
    """Dense [num_tiles, tile_capacity] table variant (tile_raster v1)."""
    num_tiles = grid_x * grid_y
    sorted_tile, sorted_gauss, counts_all, total = _sorted_instances(
        screen, grid_x, grid_y, instance_capacity
    )
    tile_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_all).astype(jnp.int32)]
    )

    safe_tile = jnp.clip(sorted_tile, 0, num_tiles - 1)
    rank = jnp.arange(instance_capacity, dtype=jnp.int32) - tile_start[safe_tile]
    keep = (sorted_tile < num_tiles) & (rank < tile_capacity)

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
        overflow_instance=instance_overflow,
        overflow_tile=tile_overflow,
    )


def bin_gaussians_instances(
    screen: GaussianScreenData,
    grid_x: int,
    grid_y: int,
    instance_capacity: int,
    tile_capacity: int,
    interpret: bool | None = None,
    corner_cull: bool = True,
) -> InstanceBinning:
    """Instance-major variant (tile_raster v2): one packed slot array,
    per-tile contiguous 128-aligned runs.

    Engineered around TPU scatter/gather costs: per-gaussian values
    expand to per-instance through per-column delta-scatters + one
    cumsum (scatters of >=2-wide rows hit a slow path: a [S,2] row
    scatter measured 173 ms where two 1-column scatters cost 26 ms);
    per-tile depth order comes from an LSD two-pass radix — stable sort
    by depth bits then by tile id, the CUDA 64-bit
    [tile | float-bits(depth)] key in lax.sort form
    (ref: rasterizer_impl.cu:70-111, 303-311).

    interpret: run the expansion kernel (ops/fill.py) in Pallas
    interpreter mode; None = auto (CPU backend).

    corner_cull: drop instances whose maximum possible alpha anywhere
    in their tile is provably < 1/255 — the blend kernel's own `active`
    test (alpha >= ALPHA_MIN) zeroes exactly these, so the contributor
    set and every blend weight are unchanged; the output matches to
    ulp-level (removing lanes repartitions the 128-instance blocks,
    regrouping the f32 transmittance sums), while the per-tile runs
    (and with them the blend kernel's steps) shrink wherever a
    gaussian's rect over-covers its ellipse (the rect corners; the CUDA
    reference pays for these too, forward.cu:390-455 — it has no
    per-tile test either). Under a BINDING tile_capacity the cull can
    additionally improve output: zero-alpha instances stop occupying
    capacity slots, letting real occluded contributors fit. Bound: with
    conic C (PSD), power <= -lam_min(C)/2 * d^2 for d = distance from
    mean2d to the tile's pixel-center box, so alpha <= op *
    exp(-lam_min/2 * d^2); instances with that bound below 1/255 (with
    a 1e-4 relative safety margin for float rounding) are retargeted to
    the out-of-grid tile before the tile sort. Off for the binning
    list-consistency tests (they compare index lists, not output, on
    degenerate zero-opacity screens).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    num_tiles = grid_x * grid_y
    n = screen.depth.shape[0]
    S = instance_capacity

    cnt0 = screen.tiles_touched  # [N] original order, 0 when culled

    # IEEE-754 bits of positive floats sort like the floats themselves
    # (all valid depths are > NEAR_Z > 0) — same trick as the CUDA key
    depth_bits = jax.lax.bitcast_convert_type(screen.depth, jnp.int32)
    depth_key_n = jnp.where(cnt0 > 0, depth_bits, jnp.int32(0x7FFFFFFF))

    # ---- depth-sort the GAUSSIANS (N-scale), then enumerate instances
    # in depth-rank order: instances are BORN depth-sorted, so the 2M
    # per-instance depth sort AND its expanded depth column disappear
    # (each per-instance delta-scatter is ~6.5 ms at bench scale — they
    # dominated binning). Ordering is bit-identical to the previous
    # expand -> stable-depth-sort -> stable-tile-sort pipeline: both
    # yield tile-major, depth-minor, original-index-tertiary. ----
    cull_n = ()
    if corner_cull:
        # per-gaussian squared "reach": alpha can hit 1/255 only within
        # r2max of the center in pixel space (power <= -lam_min/2 d^2).
        # lam_min shrunk / r2max grown by ~1e-4 relative so f32 rounding
        # can never drop an instance the kernel would have blended.
        ca, cb, cc = screen.conic[:, 0], screen.conic[:, 1], screen.conic[:, 2]
        lam_min = (
            0.5 * (ca + cc)
            - jnp.sqrt(jnp.maximum(0.25 * (ca - cc) ** 2 + cb * cb, 0.0))
        ) * (1.0 - 1e-5)
        th = 1.0 / 255.0
        op = screen.opacity
        # keep-everything sentinel is a large FINITE value: the select
        # matmul multiplies non-selected values by 0, and inf * 0 = NaN
        # would poison whole expansion blocks
        # >= so an opacity of exactly 1/255 centered on a pixel matches
        # the kernel's `alpha >= ALPHA_MIN` keep test (contributor-set
        # contract holds on the boundary too)
        r2max = jnp.where(
            op >= th,
            jnp.where(
                lam_min > 0.0,
                jnp.minimum(
                    2.0 * jnp.log(jnp.maximum(op, th) / th)
                    / jnp.maximum(lam_min, 1e-30)
                    * (1.0 + 1e-4)
                    + 1e-6,
                    1e30,
                ),
                1e30,
            ),
            -1.0,
        )
        # the cull is a non-differentiable keep/drop decision (it only
        # removes instances whose blend contribution is exactly zero)
        cull_n = jax.lax.stop_gradient(
            (screen.mean2d[:, 0], screen.mean2d[:, 1], r2max)
        )

    rwidth = screen.rect_max[:, 0] - screen.rect_min[:, 0]
    if grid_x < 128 and grid_y < 128:
        packed_rect_n = (
            screen.rect_min[:, 0]
            + (screen.rect_min[:, 1] << 7)
            + (rwidth << 14)
        )
        _, pr_s, cnt_s, oid_s, *cull_s = jax.lax.sort(
            (depth_key_n, packed_rect_n, cnt0, jnp.arange(n, dtype=jnp.int32),
             *cull_n),
            num_keys=1,
            is_stable=True,
        )
        rect_cols_s = None
    else:  # panorama-scale grids: separate rect columns
        _, rx_s, ry_s, rw_s, cnt_s, oid_s, *cull_s = jax.lax.sort(
            (
                depth_key_n,
                screen.rect_min[:, 0],
                screen.rect_min[:, 1],
                rwidth,
                cnt0,
                jnp.arange(n, dtype=jnp.int32),
                *cull_n,
            ),
            num_keys=1,
            is_stable=True,
        )
        rect_cols_s = (rx_s, ry_s, rw_s)

    offs = jnp.cumsum(cnt_s) - cnt_s
    total = offs[-1] + cnt_s[-1]

    # ---- per-instance expansion on the MXU (ops/fill.py): gaussian j's
    # run is [offs[j], offs[j+1]) (zero-count gaussians give empty
    # runs), so the expansion is a banded 0/1-select matmul. The prior
    # per-column delta-scatter + cumsum was measured at ~1.2 ms PER
    # CHANNEL at bench scale (the scatter engine serializes per position
    # AND per operand array); the select matmul does all channels in one
    # pass and is exact below 2^24 (single nonzero per slot column,
    # HIGHEST precision). Slots >= total fill as 0 instead of the old
    # fill-forward carry — every consumer masks them with `s < total`.
    from street_gaussians_tpu.ops import fill as fill_lib

    chans = (
        [oid_s, pr_s] if rect_cols_s is None else [oid_s, *rect_cols_s]
    )
    nid = len(chans)
    filled = fill_lib.expand_runs(
        jnp.stack(
            [c.astype(jnp.float32) for c in chans] + list(cull_s), axis=0
        ),
        offs,
        total,
        S,
        interpret=interpret,
    )
    gauss_i = filled[0].astype(jnp.int32)
    if rect_cols_s is None:
        pr = filled[1].astype(jnp.int32)
        rx = pr & 127
        ry = (pr >> 7) & 127
        rw = jnp.maximum(pr >> 14, 1)
    else:
        rx = filled[1].astype(jnp.int32)
        ry = filled[2].astype(jnp.int32)
        rw = jnp.maximum(filled[3].astype(jnp.int32), 1)

    s = jnp.arange(S, dtype=jnp.int32)
    inst_valid = s < total
    # within-run offset WITHOUT an offs expansion: runs start exactly
    # where the expanded gaussian id changes (distinct per gaussian)
    prev_g = jnp.concatenate([jnp.full((1,), -1, jnp.int32), gauss_i[:-1]])
    run_start = jax.lax.cummax(jnp.where(gauss_i != prev_g, s, 0))
    k = s - run_start
    tx = rx + k % rw
    ty = ry + k // rw
    live = inst_valid
    if corner_cull:
        # distance from the gaussian center to this tile's pixel-center
        # box [16 tx, 16 tx + 15] x [16 ty, 16 ty + 15] (integer pixel
        # coordinates, matching the kernel's _pixel_coords)
        mx_i, my_i, r2_i = filled[nid], filled[nid + 1], filled[nid + 2]
        px0 = tx.astype(jnp.float32) * 16.0
        py0 = ty.astype(jnp.float32) * 16.0
        dx = jnp.clip(mx_i, px0, px0 + 15.0) - mx_i
        dy = jnp.clip(my_i, py0, py0 + 15.0) - my_i
        live = live & (dx * dx + dy * dy <= r2_i)
    tile_id = jnp.where(live, ty * grid_x + tx, num_tiles).astype(jnp.int32)
    gauss_id = jnp.where(live, gauss_i, -1).astype(jnp.int32)

    # ---- per-tile depth order from ONE stable tile sort (enumeration
    # order is already depth order; stability preserves it per tile) ----
    st, sg = jax.lax.sort((tile_id, gauss_id), num_keys=1, is_stable=True)

    # ---- per-tile starts: `st` is SORTED, so tile t's run starts at
    # the first index with st >= t — one vectorized searchsorted with
    # T+1 queries (log2(S) ~ 21 gather passes of [T+1] elements). The
    # previous formulation scattered S-scale boundary markers into the
    # [T+1] table (+ a reverse cummin): the scatter engine serializes
    # per UPDATE, so that cost 7.3 ms/frame at bench scale for a 6.7k
    # output (round-4 trace, fusion.21). Query T (> any real tile id)
    # lands at the LIVE row count: corner-culled and invalid rows sort
    # to tile `num_tiles`, and the last real tile's run must not
    # swallow them. ----
    tile_start = jnp.searchsorted(
        st, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    # clamp to [0, S]: with instance overflow, runs past capacity must
    # keep descriptors (and the kernel's block indices) in bounds
    tile_start = jnp.minimum(tile_start, S)
    counts_all = tile_start[1:] - tile_start[:-1]

    clamped = jnp.minimum(counts_all, tile_capacity)

    # ---- ragged layout: the packed array IS the sorted array. Tile t's
    # run occupies rows [tile_start[t], tile_start[t] + clamped[t]); the
    # blend kernel masks boundary blocks by global row range, so no
    # alignment scatter is needed at all (a [S_pad] scatter-set cost
    # ~13 ms and 128-aligned padding grew every downstream array by
    # 128 * num_tiles slots). ----
    if tile_capacity >= instance_capacity:
        # cap can never bind (a tile cannot hold more instances than
        # exist) — skip the rank machinery (a second S-scale cummax)
        keep = st < num_tiles
    else:
        prev_t = jnp.concatenate([jnp.full((1,), -1, jnp.int32), st[:-1]])
        boundary = (st != prev_t) & (st < num_tiles)
        running_start = jax.lax.cummax(jnp.where(boundary, s, 0))
        rank = s - running_start
        keep = (st < num_tiles) & (rank < tile_capacity)
    inst_gauss = jnp.where(keep, sg, -1)

    instance_overflow = jnp.maximum(total - instance_capacity, 0)
    tile_overflow = jnp.sum(jnp.maximum(counts_all - tile_capacity, 0))
    return InstanceBinning(
        inst_gauss=inst_gauss,
        tile_count=clamped,
        tile_start=tile_start[:-1],
        num_instances=total,
        overflow=instance_overflow + tile_overflow,
        overflow_instance=instance_overflow,
        overflow_tile=tile_overflow,
    )
