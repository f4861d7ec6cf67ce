"""Instance-major Pallas TPU tile-blend kernel (fwd + custom-VJP bwd).

Second-generation layout (v1 in tile_raster.py kept as the
interpreter-mode path): instances live in ONE packed array of
128-instance blocks, each tile owning a contiguous, 128-aligned run
(binning.bin_gaussians_instances). Tile runs are RAGGED: tile t owns
rows [tile_start[t], tile_start[t] + count) of the sorted instance
array with NO 128-alignment (the alignment scatter cost ~13 ms and
padded every downstream array); boundary blocks are shared between
adjacent tiles and masked in-kernel by global row range. The kernel
walks a FLATTENED sequential grid of real (tile, block) pairs — empty
tiles get NO step; their output blocks are patched by a fused where —
with per-step tile/block/flag tables
scalar-prefetched (a regular (tiles, MAX_BLOCKS) grid wastes ~40% of
its steps re-visiting tail blocks; grid-step overhead is a first-order
cost at ~0.7 us/step). The BlockSpec index_map reads the prefetched
tables, so the Pallas runtime still double-buffers the 8 KB payload
blocks across steps.

Same math as v1 (= the CUDA reference, forward.cu:340-467 /
backward.cu:414-641): front-to-back alpha blending with early
termination, per-pixel-abs AbsGS gradient rows, suffix-sum backward in
forward order (no atomics; the payload-block build outside the kernel
has a sort + segment-sum transpose, ops/rasterize.py).

Payload block layout: [num_blocks(+1 trash), c_pad, 128]; c_pad rows:
  0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
  6..6+F features, 6+F..6+F+2 abs-grad dummies (zero).
The blend-state carry (T, done, accum / u_accum) lives in VMEM scratch,
persisting across the sequential steps of each tile; it is reset at the
tile's first step and the output block is written at its last.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from street_gaussians_tpu.ops.tile_raster import (
    ABS_ROWS,
    ALPHA_MAX,
    ALPHA_MIN,
    PAYLOAD_HEADER,
    PIX,
    T_EPS,
    TILE,
    payload_rows,
)

# Instances per payload block / per kernel step. MEASURED OPTIMUM: 128.
# 256 was tried to halve the ~0.6 us/step grid machinery (round 3) and
# REGRESSED 6.10 -> 5.47 it/s: the lane prefix-sum is a [CHUNK, CHUNK]
# triangular matmul per [PIX, CHUNK] block, so its MAC count scales
# LINEARLY with CHUNK per instance (2x at 256), and the coarser block
# granularity wastes more early-terminated lanes — both outgrow the
# saved step overhead. Everything downstream is parametric in this
# constant (build_payload_blocks pads capacity to a block multiple), so
# re-tuning on future hardware is a one-line change.
CHUNK = 128


def _pixel_coords(tile_id, grid_x):
    tile_x = tile_id % grid_x
    tile_y = tile_id // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tile_x * TILE + p % TILE).astype(jnp.float32)
    py = (tile_y * TILE + p // TILE).astype(jnp.float32)
    return px, py


LOG_T_EPS = float(np.log(T_EPS))


def _tri_lower_incl():
    """[CHUNK, CHUNK] f32 L with L[i, j] = (i <= j): x @ L is an
    inclusive lane prefix-sum ON THE MXU. Replaces the 7-step
    Hillis-Steele roll chains, whose roll+mask+op triples were ~60% of
    kernel VPU time (probe_kernel.py: fwd 52 -> 32 ms at bench scale)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (ii <= jj).astype(jnp.float32)


def _lane_prefix_sum(x, exact=False, interpret=False):
    """Inclusive prefix-sum along lanes via the triangular matmul.

    exact=True: real-valued summands. On hardware this is a manual
    TWO-pass bf16 split (hi = bf16(x), lo = x - hi; prefix(hi) +
    prefix(lo)) — ~2^-16-relative addend fidelity at 2/3 the MXU passes
    of Precision.HIGHEST's bf16x3 (the blend kernels are MXU-tile-bound
    on exactly these prefix products; worst-case drift measured by
    script/tpu_drift_check.py, bounded by the existing gate). The
    interpret (CPU oracle-parity) path keeps the single exact-f32 dot.
    The default single-pass bf16 is reserved for 0/1 indicators, which
    it sums exactly."""
    L = _tri_lower_incl()
    dims = (((1,), (0,)), ((), ()))
    if exact and not interpret:
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        return jax.lax.dot_general(
            hi, L, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            lo, L, dims, preferred_element_type=jnp.float32
        )
    return jax.lax.dot_general(
        x,
        L,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else None,
    )


def _block_alpha(blk_ref, px, py, done, slot_valid, interpret=False):
    """blk_ref: [1, c_pad, CHUNK] VMEM block. slot_valid: [1, CHUNK].

    Returns (a, om, logs, cums_incl, extras): logs = log1p(-a) and its
    inclusive lane prefix-sum — the blend recurrence runs in LOG space
    so the carry update and the termination test need no exp at all;
    only the blend weights pay one exp per block.
    """
    mx = blk_ref[0, 0:1, :]
    my = blk_ref[0, 1:2, :]
    ca = blk_ref[0, 2:3, :]
    cb = blk_ref[0, 3:4, :]
    cc = blk_ref[0, 4:5, :]
    op = blk_ref[0, 5:6, :]

    dx = mx - px  # [PIX, CHUNK]
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    apow = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * apow
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    active = (power <= 0.0) & (alpha >= ALPHA_MIN) & (done <= 0.0) & slot_valid
    a = jnp.where(active, alpha, 0.0)
    om = 1.0 - a  # >= 0.01 (alpha clamp)
    logs = jnp.log1p(-a)
    cums_incl = _lane_prefix_sum(logs, exact=True, interpret=interpret)
    return a, om, logs, cums_incl, (dx, dy, ca, cb, cc, apow, alpha_raw)


def _blend_masks_log(a, cums_incl, logT):
    """Trigger/blend masks with the carry transmittance in log space.

    No prefix op needed: `cums_incl` is an inclusive prefix sum of
    non-positive logs, hence NON-INCREASING along the lane axis, so
    "some lane i <= j triggered" (done_cum) collapses to a per-lane
    comparison. Proof sketch: let m_j = (logT + cums_j >= LOG_T_EPS)
    (monotone 1->0). If m_j: every i <= j has cums_i >= cums_j, so no
    trigger at or before j and blend_j = (a_j > 0). If not m_j and
    a_j > 0: j itself triggers (the INCLUSIVE prefix counted it), so
    blend_j = 0. Both cases equal (a > 0) & m. The proof holds in exact
    arithmetic; on hardware cums_incl comes from the two-pass bf16-split
    prefix matmul whose per-lane rounding can break monotonicity by
    ~2^-16-relative, letting a lane just past termination blend with
    weight up to ~T_EPS-scale — inside the early-termination
    approximation's own budget and covered by script/tpu_drift_check.py
    after every kernel change. This removes one
    [PIX, CHUNK] @ [CHUNK, CHUNK] matmul per block from BOTH kernels —
    the kernels are MXU-bound on exactly these prefix products
    (~0.27 us/step of the measured ~1.4 us steps)."""
    not_term = logT + cums_incl >= LOG_T_EPS
    blend = (a > 0.0) & not_term
    trigger = (a > 0.0) & jnp.logical_not(not_term)
    return trigger, blend


def _slot_valid(blk, start, cnt):
    """Lanes of global payload block `blk` inside [start, start+cnt)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    glob = blk * CHUNK + lane
    return (glob >= start) & (glob < start + cnt)


# --------------------------------------------------------------------------
# flattened (tile, block) step tables
# --------------------------------------------------------------------------


def _max_steps(num_blocks: int, num_tiles: int) -> int:
    # each of a tile's blocks is one step and a block can be shared by
    # adjacent tiles (ragged boundaries), so charge one extra block per
    # tile; EMPTY tiles get no step at all — their output blocks are
    # patched by a fused `where` after the call (sky regions leave
    # ~2k empty tiles at bench scale; a step costs ~0.5 us of grid
    # machinery plus a 128 KB lane-padded output write)
    return num_blocks + num_tiles + 1


def _tile_nblocks(tile_start, tile_count):
    """Blocks spanned by the ragged run [start, start + cnt)."""
    return jnp.where(
        tile_count > 0,
        (tile_start % CHUNK + tile_count + CHUNK - 1) // CHUNK,
        0,
    )


def _flatten_steps(tile_start, tile_count, num_tiles, num_blocks, trash,
                   interpret=False):
    """Per-step tables for the flattened grid, PACKED into two int32
    words per step (the scalar-prefetch tables live in SMEM, whose 1 MB
    budget bounds the grid size — five unpacked tables overflowed it at
    instance_capacity 2^23, the watchdog's default ceiling):

      w1: bits 0-16 global payload-block index (blk), bit 17
          write-first flag, bit 18 last-step flag;
      w2: bits 0-16 block-in-tile index (i), bits 17+ tile id.

    Static limits (checked by the callers): payload blocks < 2^17
    (~16.7M instances) and tiles < 2^14 (any <=1600px-wide image up to
    ~2600 px tall — the reference caps width at 1600,
    camera_utils.py:140)."""
    from street_gaussians_tpu.ops import fill as fill_lib

    MAXC = _max_steps(num_blocks, num_tiles)
    # EVERY tile gets >= 1 step: an empty tile's single step runs only
    # the i==0 state reset and the last-step write, emitting the empty
    # blend state (accum 0, T = 1) from the kernel itself. The previous
    # zero-step scheme patched empty tiles with a fused `where` over the
    # whole lane-padded [T, 256, F+1] output (~878 MB read+write,
    # 2.7 ms/iter at bench scale); an extra grid step costs ~0.6 us.
    # `real`/write_first below still use the ACTUAL block count, so an
    # empty tile's step never claims a payload block write (the backward
    # accumulation invariant).
    nblocks_t = _tile_nblocks(tile_start, tile_count)  # [T]
    alloc_t = jnp.maximum(nblocks_t, 1)  # grid steps per tile
    starts = jnp.cumsum(alloc_t) - alloc_t
    step = jnp.arange(MAXC, dtype=jnp.int32)

    # expansion via the MXU select kernel (one pass for all 4 channels;
    # the per-channel scatter+cumsum chain cost ~7 ms/iter at bench
    # scale). Steps beyond the live range must carry the LAST tile's
    # values — a tail step targets tile_of_step[s] as its output block,
    # and an output block must never be left and revisited (Pallas
    # would flush the stale VMEM buffer over it) — so the kernel's
    # zero-fill is overridden with the old fill-forward's carry values.
    b0_t = (tile_start // CHUNK).astype(jnp.int32)
    chans = jnp.stack(
        [
            jnp.arange(num_tiles, dtype=jnp.int32).astype(jnp.float32),
            starts.astype(jnp.float32),
            nblocks_t.astype(jnp.float32),
            b0_t.astype(jnp.float32),
        ],
        axis=0,
    )
    total_steps = starts[-1] + alloc_t[-1]
    filled = fill_lib.expand_runs(
        chans, starts.astype(jnp.int32), total_steps, MAXC,
        interpret=interpret,
    )
    live = step < total_steps
    tile_of_step = jnp.where(
        live, filled[0].astype(jnp.int32), num_tiles - 1
    )
    start_of_step = jnp.where(live, filled[1].astype(jnp.int32), starts[-1])
    i_of_step = step - start_of_step
    nblocks_of_step = jnp.where(
        live, filled[2].astype(jnp.int32), nblocks_t[-1]
    )
    b0_of_step = jnp.where(live, filled[3].astype(jnp.int32), b0_t[-1])
    # block ids are globally NON-DECREASING across real steps (runs are
    # contiguous); empty/tail steps carry the previous real block so an
    # output block is never left and revisited (Pallas would not refetch
    # it). A ragged boundary block is shared by adjacent tiles — the
    # backward ACCUMULATES into it, so mark the first writing step.
    real = i_of_step < nblocks_of_step
    blk_mono = jax.lax.cummax(jnp.where(real, b0_of_step + i_of_step, 0))
    prev_blk = jnp.concatenate([jnp.full((1,), -1, jnp.int32), blk_mono[:-1]])
    # the cummax fill value 0 collides with block id 0: when leading
    # tiles are empty, the first REAL step writing block 0 would see
    # blk_mono == prev_blk and accumulate into uninitialized VMEM
    # (interpret mode zero-fills outputs, hiding it) — force wf=1 on
    # the first real step unconditionally
    first_real = real & (jnp.cumsum(real.astype(jnp.int32)) == 1)
    write_first = (real & ((blk_mono > prev_blk) | first_real)).astype(
        jnp.int32
    )
    last_of_step = (
        i_of_step == jnp.maximum(nblocks_of_step, 1) - 1
    ).astype(jnp.int32)
    w1 = blk_mono | (write_first << 17) | (last_of_step << 18)
    w2 = i_of_step | (tile_of_step << 17)
    return w1, w2


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _check_pack_limits(nb_total: int, num_tiles: int) -> None:
    """Static limits of the packed step tables (SMEM budget fix): blk
    ids use 17 bits, tile ids the remaining 14. Both bounds are far
    beyond the watchdog's default instance ceiling (2^23 instances ->
    ~66k blocks) and the reference's 1600px-wide images."""
    if nb_total > 2 ** 17:
        raise ValueError(
            f"{nb_total} payload blocks exceeds the packed step-table "
            "limit 2^17 (~16.7M instances); lower instance_capacity or "
            "shard the tile axis (parallel/tiles.py)"
        )
    if num_tiles >= 2 ** 14:
        raise ValueError(
            f"{num_tiles} tiles exceeds the packed step-table limit "
            "2^14; shard the tile axis (parallel/tiles.py)"
        )


def _fwd_kernel(
    w1_ref,
    w2_ref,
    start_ref,
    cnt_ref,
    blk_ref,
    out_ref,
    logT_s,
    done_s,
    accum_s,
    *,
    num_features,
    grid_x,
    interpret=False,
):
    F = num_features
    s = pl.program_id(0)
    t = w2_ref[s] >> 17
    i = w2_ref[s] & 0x1FFFF
    blk_idx = w1_ref[s] & 0x1FFFF
    last = (w1_ref[s] >> 18) & 1
    start = start_ref[t]
    cnt = cnt_ref[t]
    nblocks = jnp.where(cnt > 0, (start % CHUNK + cnt + CHUNK - 1) // CHUNK, 0)

    @pl.when(i == 0)
    def _():
        logT_s[...] = jnp.zeros((PIX, 1), jnp.float32)
        done_s[...] = jnp.zeros((PIX, 1), jnp.float32)
        accum_s[...] = jnp.zeros((PIX, F), jnp.float32)

    @pl.when((i < nblocks) & (jnp.min(done_s[...]) <= 0.0))
    def _():
        px, py = _pixel_coords(t, grid_x)
        logT = logT_s[...]
        done = done_s[...]
        a, om, logs, cums_incl, _ = _block_alpha(
            blk_ref, px, py, done, _slot_valid(blk_idx, start, cnt),
            interpret=interpret,
        )
        trigger, blend = _blend_masks_log(a, cums_incl, logT)
        # w_j = a_j * T_in * prod_{i<j}(1-a_i), all in log space
        w = jnp.where(blend, a * jnp.exp(logT + cums_incl - logs), 0.0)
        feat = blk_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, :]  # [F, CHUNK]
        accum_s[...] = accum_s[...] + jax.lax.dot_general(
            w,
            feat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logs_eff = jnp.where(blend, logs, 0.0)
        logT_s[...] = logT + jnp.sum(logs_eff, axis=1, keepdims=True)
        done_s[...] = jnp.maximum(
            done, jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True)
        )

    @pl.when(last == 1)
    def _():
        out_ref[0, :, 0:F] = accum_s[...]
        out_ref[0, :, F : F + 1] = jnp.exp(logT_s[...])


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    w1_ref,
    w2_ref,
    start_ref,
    cnt_ref,
    blk_ref,
    out_res_ref,
    gout_ref,
    dblk_ref,
    logT_s,
    done_s,
    u_s,
    *,
    num_features,
    grid_x,
    interpret=False,
):
    F = num_features
    s = pl.program_id(0)
    t = w2_ref[s] >> 17
    i = w2_ref[s] & 0x1FFFF
    blk_idx = w1_ref[s] & 0x1FFFF
    wf = (w1_ref[s] >> 17) & 1
    start = start_ref[t]
    cnt = cnt_ref[t]
    nblocks = jnp.where(cnt > 0, (start % CHUNK + cnt + CHUNK - 1) // CHUNK, 0)

    @pl.when(i == 0)
    def _():
        logT_s[...] = jnp.zeros((PIX, 1), jnp.float32)
        done_s[...] = jnp.zeros((PIX, 1), jnp.float32)
        u_s[...] = jnp.zeros((PIX, 1), jnp.float32)

    # early termination: once every pixel of the tile has terminated,
    # remaining blocks contribute exactly zero gradient — skip their
    # compute; a block whose FIRST writer is a terminated step still
    # needs its zeros written (the copy-back would otherwise flush a
    # stale VMEM buffer). The forward has the same skip; the backward
    # walks the same blocks so `nblocks` stays aligned.
    alldone = jnp.min(done_s[...]) > 0.0

    @pl.when((i < nblocks) & alldone & (wf == 1))
    def _():
        dblk_ref[0] = jnp.zeros(dblk_ref.shape[1:], jnp.float32)

    @pl.when((i < nblocks) & jnp.logical_not(alldone))
    def _():
        px, py = _pixel_coords(t, grid_x)
        g = gout_ref[0, :, 0:F]
        gT = gout_ref[0, :, F : F + 1]
        out_feat = out_res_ref[0, :, 0:F]
        T_fin = out_res_ref[0, :, F : F + 1]
        S_total = jnp.sum(g * out_feat, axis=1, keepdims=True)
        gT_Tfin = gT * T_fin

        logT = logT_s[...]
        done = done_s[...]
        a, om, logs, cums_incl, extras = _block_alpha(
            blk_ref, px, py, done, _slot_valid(blk_idx, start, cnt),
            interpret=interpret,
        )
        dx, dy, ca, cb, cc, apow, alpha_raw = extras
        trigger, blend = _blend_masks_log(a, cums_incl, logT)

        Tprefix = jnp.exp(logT + cums_incl - logs)
        w = jnp.where(blend, a * Tprefix, 0.0)
        feat = blk_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, :]
        phi = jax.lax.dot_general(
            g,
            feat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u = w * phi
        # single-pass bf16 prefix: the suffix feeds `da` additively next
        # to gT_Tfin and the per-addend 2^-8 rounding is ~1e-3 of the
        # gradient scale (drift-gate-verified); the LOG-transmittance
        # prefix above must stay two-pass (its error exponentiates into
        # the blend weights)
        if interpret:
            cumsum_u = _lane_prefix_sum(u, exact=True, interpret=True) + u_s[...]
        else:
            cumsum_u = _lane_prefix_sum(u) + u_s[...]
        suffix = S_total - cumsum_u

        da = jnp.where(blend, Tprefix * phi - (suffix + gT_Tfin) / om, 0.0)
        unclamped = alpha_raw <= ALPHA_MAX
        da_eff = jnp.where(unclamped, da, 0.0)
        dpow = alpha_raw * da_eff
        rows = [
            jnp.sum(-(ca * dx + cb * dy) * dpow, axis=0, keepdims=True),
            jnp.sum(-(cc * dy + cb * dx) * dpow, axis=0, keepdims=True),
            jnp.sum(-0.5 * dx * dx * dpow, axis=0, keepdims=True),
            jnp.sum(-dx * dy * dpow, axis=0, keepdims=True),
            jnp.sum(-0.5 * dy * dy * dpow, axis=0, keepdims=True),
            jnp.sum(apow * da_eff, axis=0, keepdims=True),
            jax.lax.dot_general(
                g,
                w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            jnp.sum(jnp.abs((ca * dx + cb * dy) * dpow), axis=0, keepdims=True),
            jnp.sum(jnp.abs((cc * dy + cb * dx) * dpow), axis=0, keepdims=True),
        ]
        pad0 = payload_rows(F) - (PAYLOAD_HEADER + F + ABS_ROWS)
        if pad0 > 0:
            rows.append(jnp.zeros((pad0, CHUNK), jnp.float32))
        new_rows = jnp.concatenate(rows, axis=0)  # [c_pad, CHUNK]

        # ragged boundary blocks are shared between adjacent tiles:
        # first writer sets, later writers accumulate
        @pl.when(wf == 1)
        def _():
            dblk_ref[0] = new_rows

        @pl.when(wf == 0)
        def _():
            dblk_ref[0] = dblk_ref[0] + new_rows

        logs_eff = jnp.where(blend, logs, 0.0)
        logT_s[...] = logT + jnp.sum(logs_eff, axis=1, keepdims=True)
        done_s[...] = jnp.maximum(
            done, jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True)
        )
        u_s[...] = u_s[...] + jnp.sum(u, axis=1, keepdims=True)


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------


def _fwd_call(payload, tile_start, tile_count, num_features, grid_x, num_tiles,
              tile_capacity, interpret, tables=None):
    nb_total, c_pad, _ = payload.shape  # includes the +1 trash block
    F = num_features
    trash = nb_total - 1
    _check_pack_limits(nb_total, num_tiles)
    w1, w2 = tables if tables is not None else _flatten_steps(
        tile_start, tile_count, num_tiles, nb_total - 1, trash,
        interpret=interpret,
    )
    MAXC = w1.shape[0]
    kernel = functools.partial(
        _fwd_kernel, num_features=F, grid_x=grid_x, interpret=interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(MAXC,),
        in_specs=[
            pl.BlockSpec(
                (1, c_pad, CHUNK),
                lambda s, w1_, w2_, st_, cnt_: (w1_[s] & 0x1FFFF, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PIX, F + 1),
            lambda s, w1_, w2_, st_, cnt_: (w2_[s] >> 17, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, F), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, F + 1), jnp.float32),
        interpret=interpret,
    )(w1, w2, tile_start, tile_count, payload)


def _bwd_call(payload, tile_start, tile_count, out_res, gout, num_features,
              grid_x, num_tiles, tile_capacity, interpret, tables=None):
    nb_total, c_pad, _ = payload.shape
    F = num_features
    trash = nb_total - 1
    _check_pack_limits(nb_total, num_tiles)
    w1, w2 = tables if tables is not None else _flatten_steps(
        tile_start, tile_count, num_tiles, nb_total - 1, trash,
        interpret=interpret,
    )
    MAXC = w1.shape[0]
    kernel = functools.partial(
        _bwd_kernel, num_features=F, grid_x=grid_x, interpret=interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(MAXC,),
        in_specs=[
            pl.BlockSpec(
                (1, c_pad, CHUNK),
                lambda s, w1_, w2_, st_, cnt_: (w1_[s] & 0x1FFFF, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PIX, F + 1),
                lambda s, w1_, w2_, st_, cnt_: (w2_[s] >> 17, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PIX, F + 1),
                lambda s, w1_, w2_, st_, cnt_: (w2_[s] >> 17, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c_pad, CHUNK),
            lambda s, w1_, w2_, st_, cnt_: (w1_[s] & 0x1FFFF, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_total, c_pad, CHUNK), jnp.float32),
        interpret=interpret,
    )(w1, w2, tile_start, tile_count, payload, out_res, gout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def tile_blend_instances(
    payload, tile_start, tile_count, num_features, grid_x, num_tiles,
    tile_capacity, interpret=False,
):
    """Alpha-blend instance-major payload blocks (ragged tile runs).

    payload: [num_blocks + 1, c_pad, 128] f32 — the final block is a
    trash target for empty/tail steps (layout in module docstring);
    tile_start/tile_count: [num_tiles] int32 ragged run descriptors.
    Returns [num_tiles, 256, F+1].
    """
    return _fwd_call(
        payload, tile_start, tile_count, num_features, grid_x, num_tiles,
        tile_capacity, interpret,
    )


def _fwd_rule(payload, tile_start, tile_count, num_features, grid_x, num_tiles,
              tile_capacity, interpret):
    # the step tables are a pure function of (tile_start, tile_count):
    # compute ONCE and thread them to the backward through the residuals
    # (the expand scatters cost ~3.6 ms/step at bench scale; computing
    # them twice was pure waste)
    tables = _flatten_steps(
        tile_start, tile_count, num_tiles, payload.shape[0] - 1,
        payload.shape[0] - 1, interpret=interpret,
    )
    out = _fwd_call(
        payload, tile_start, tile_count, num_features, grid_x, num_tiles,
        tile_capacity, interpret, tables=tables,
    )
    return out, (payload, tile_start, tile_count, out, tables)


def _bwd_rule(num_features, grid_x, num_tiles, tile_capacity, interpret, res, gout):
    payload, tile_start, tile_count, out, tables = res
    d_payload = _bwd_call(
        payload, tile_start, tile_count, out, gout,
        num_features, grid_x, num_tiles, tile_capacity, interpret,
        tables=tables,
    )
    return d_payload, None, None


tile_blend_instances.defvjp(_fwd_rule, _bwd_rule)
