"""Instance-major Pallas TPU tile-blend kernel (fwd + custom-VJP bwd).

Second-generation layout (v1 in tile_raster.py kept as the
interpreter-mode path): instances live in ONE packed array of
128-instance blocks, each tile owning a contiguous, 128-aligned run
(binning.bin_gaussians_instances). The kernel runs a regular
(num_tiles, MAX_BLOCKS) grid whose BlockSpec index_map reads the
scalar-prefetched per-tile block offsets — the Pallas runtime
double-buffers the 8 KB payload blocks across grid steps automatically,
so per-tile work is proportional to the actual instance count with no
dense [T, K] table on the XLA side.

Same math as v1 (= the CUDA reference, forward.cu:340-467 /
backward.cu:414-641): front-to-back alpha blending with early
termination, per-pixel-abs AbsGS gradient rows, suffix-sum backward in
forward order (no atomics; the payload gather's transpose outside the
kernel scatter-adds per-instance gradients deterministically).

Payload block layout: [num_blocks(+1 trash), c_pad, 128]; c_pad rows:
  0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
  6..6+F features, 6+F..6+F+2 abs-grad dummies (zero).
The blend-state carry (T, done, accum / u_accum) lives in VMEM scratch,
persisting across the sequential i-steps of each tile; it is reset at
i == 0 and the output block is written at the final step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from street_gaussians_tpu.ops.tile_raster import (
    ABS_ROWS,
    ALPHA_MAX,
    ALPHA_MIN,
    CHUNK,
    PAYLOAD_HEADER,
    PIX,
    T_EPS,
    TILE,
    _cumsum_lanes,
    payload_rows,
)


def _pixel_coords(tile_id, grid_x):
    tile_x = tile_id % grid_x
    tile_y = tile_id // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tile_x * TILE + p % TILE).astype(jnp.float32)
    py = (tile_y * TILE + p // TILE).astype(jnp.float32)
    return px, py


def _block_alpha(blk_ref, px, py, done, slot_valid):
    """blk_ref: [1, c_pad, CHUNK] VMEM block. slot_valid: [1, CHUNK]."""
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
    logs = jnp.log1p(-a)
    cums_incl = _cumsum_lanes(logs)
    return a, logs, cums_incl, (dx, dy, ca, cb, cc, apow, alpha_raw)


def _blend_masks(a, cums_incl, T):
    test_T = T * jnp.exp(cums_incl)
    trigger = (a > 0.0) & (test_T < T_EPS)
    done_cum = _cumsum_lanes(trigger.astype(jnp.float32)) > 0.0
    blend = (a > 0.0) & jnp.logical_not(done_cum)
    return trigger, blend


def _slot_valid(i, cnt):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return i * CHUNK + lane < cnt


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    bs_ref,
    cnt_ref,
    blk_ref,
    out_ref,
    T_s,
    done_s,
    accum_s,
    *,
    num_features,
    grid_x,
    max_blocks,
):
    F = num_features
    t = pl.program_id(0)
    i = pl.program_id(1)
    cnt = cnt_ref[t]
    nblocks = pl.cdiv(cnt, CHUNK)

    @pl.when(i == 0)
    def _():
        T_s[...] = jnp.ones((PIX, 1), jnp.float32)
        done_s[...] = jnp.zeros((PIX, 1), jnp.float32)
        accum_s[...] = jnp.zeros((PIX, F), jnp.float32)

    @pl.when((i < nblocks) & (jnp.min(done_s[...]) <= 0.0))
    def _():
        px, py = _pixel_coords(t, grid_x)
        T = T_s[...]
        done = done_s[...]
        a, logs, cums_incl, _ = _block_alpha(
            blk_ref, px, py, done, _slot_valid(i, cnt)
        )
        trigger, blend = _blend_masks(a, cums_incl, T)
        w = jnp.where(blend, a * T * jnp.exp(cums_incl - logs), 0.0)
        feat = blk_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, :]  # [F, CHUNK]
        accum_s[...] = accum_s[...] + jax.lax.dot_general(
            w,
            feat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logs_eff = jnp.where(blend, logs, 0.0)
        T_s[...] = T * jnp.exp(jnp.sum(logs_eff, axis=1, keepdims=True))
        done_s[...] = jnp.maximum(
            done, jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True)
        )

    @pl.when(i == max_blocks - 1)
    def _():
        out_ref[0, :, 0:F] = accum_s[...]
        out_ref[0, :, F : F + 1] = T_s[...]


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    bs_ref,
    cnt_ref,
    blk_ref,
    out_res_ref,
    gout_ref,
    dblk_ref,
    T_s,
    done_s,
    u_s,
    *,
    num_features,
    grid_x,
    max_blocks,
):
    F = num_features
    t = pl.program_id(0)
    i = pl.program_id(1)
    cnt = cnt_ref[t]
    nblocks = pl.cdiv(cnt, CHUNK)

    @pl.when(i == 0)
    def _():
        T_s[...] = jnp.ones((PIX, 1), jnp.float32)
        done_s[...] = jnp.zeros((PIX, 1), jnp.float32)
        u_s[...] = jnp.zeros((PIX, 1), jnp.float32)

    @pl.when(i < nblocks)
    def _():
        px, py = _pixel_coords(t, grid_x)
        g = gout_ref[0, :, 0:F]
        gT = gout_ref[0, :, F : F + 1]
        out_feat = out_res_ref[0, :, 0:F]
        T_fin = out_res_ref[0, :, F : F + 1]
        S_total = jnp.sum(g * out_feat, axis=1, keepdims=True)
        gT_Tfin = gT * T_fin

        T = T_s[...]
        done = done_s[...]
        a, logs, cums_incl, extras = _block_alpha(
            blk_ref, px, py, done, _slot_valid(i, cnt)
        )
        dx, dy, ca, cb, cc, apow, alpha_raw = extras
        trigger, blend = _blend_masks(a, cums_incl, T)

        Tprefix = T * jnp.exp(cums_incl - logs)
        w = jnp.where(blend, a * Tprefix, 0.0)
        feat = blk_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, :]
        phi = jax.lax.dot_general(
            g,
            feat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u = w * phi
        cumsum_u = _cumsum_lanes(u) + u_s[...]
        suffix = S_total - cumsum_u

        da = jnp.where(blend, Tprefix * phi - (suffix + gT_Tfin) / (1.0 - a), 0.0)
        unclamped = alpha_raw <= ALPHA_MAX
        da_eff = jnp.where(unclamped, da, 0.0)
        dpow = alpha_raw * da_eff
        dblk_ref[0, 0:1, :] = jnp.sum(-(ca * dx + cb * dy) * dpow, axis=0, keepdims=True)
        dblk_ref[0, 1:2, :] = jnp.sum(-(cc * dy + cb * dx) * dpow, axis=0, keepdims=True)
        dblk_ref[0, 2:3, :] = jnp.sum(-0.5 * dx * dx * dpow, axis=0, keepdims=True)
        dblk_ref[0, 3:4, :] = jnp.sum(-dx * dy * dpow, axis=0, keepdims=True)
        dblk_ref[0, 4:5, :] = jnp.sum(-0.5 * dy * dy * dpow, axis=0, keepdims=True)
        dblk_ref[0, 5:6, :] = jnp.sum(apow * da_eff, axis=0, keepdims=True)
        dblk_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, :] = jax.lax.dot_general(
            g,
            w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dblk_ref[0, PAYLOAD_HEADER + F : PAYLOAD_HEADER + F + 1, :] = jnp.sum(
            jnp.abs((ca * dx + cb * dy) * dpow), axis=0, keepdims=True
        )
        dblk_ref[0, PAYLOAD_HEADER + F + 1 : PAYLOAD_HEADER + F + 2, :] = jnp.sum(
            jnp.abs((cc * dy + cb * dx) * dpow), axis=0, keepdims=True
        )
        pad0 = payload_rows(F) - (PAYLOAD_HEADER + F + ABS_ROWS)
        if pad0 > 0:
            dblk_ref[0, PAYLOAD_HEADER + F + ABS_ROWS :, :] = jnp.zeros(
                (pad0, CHUNK), jnp.float32
            )

        logs_eff = jnp.where(blend, logs, 0.0)
        T_s[...] = T * jnp.exp(jnp.sum(logs_eff, axis=1, keepdims=True))
        done_s[...] = jnp.maximum(
            done, jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True)
        )
        u_s[...] = u_s[...] + jnp.sum(u, axis=1, keepdims=True)


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------


def _max_blocks(tile_capacity: int) -> int:
    return (tile_capacity + CHUNK - 1) // CHUNK


def _in_block_index(t, i, bs_ref, cnt_ref, trash_block):
    """Dynamic payload-block index from the prefetched offsets. Tail
    steps re-point at the tile's last block (no refetch); empty tiles
    point at the dedicated trash block."""
    nb = pl.cdiv(cnt_ref[t], CHUNK)
    idx = bs_ref[t] + jnp.minimum(i, jnp.maximum(nb - 1, 0))
    return (jnp.where(nb > 0, idx, trash_block), 0, 0)


def _fwd_call(payload, block_start, tile_count, num_features, grid_x, num_tiles,
              tile_capacity, interpret):
    nb_total, c_pad, _ = payload.shape  # includes the +1 trash block
    F = num_features
    MAXB = _max_blocks(tile_capacity)
    kernel = functools.partial(
        _fwd_kernel, num_features=F, grid_x=grid_x, max_blocks=MAXB
    )
    trash = nb_total - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles, MAXB),
        in_specs=[
            pl.BlockSpec(
                (1, c_pad, CHUNK),
                functools.partial(_in_block_index, trash_block=trash),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PIX, F + 1), lambda t, i, *_: (t, 0, 0), memory_space=pltpu.VMEM
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
    )(block_start, tile_count, payload)


def _bwd_call(payload, block_start, tile_count, out_res, gout, num_features,
              grid_x, num_tiles, tile_capacity, interpret):
    nb_total, c_pad, _ = payload.shape
    F = num_features
    MAXB = _max_blocks(tile_capacity)
    kernel = functools.partial(
        _bwd_kernel, num_features=F, grid_x=grid_x, max_blocks=MAXB
    )
    trash = nb_total - 1
    idx_fn = functools.partial(_in_block_index, trash_block=trash)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles, MAXB),
        in_specs=[
            pl.BlockSpec((1, c_pad, CHUNK), idx_fn, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, PIX, F + 1), lambda t, i, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, PIX, F + 1), lambda t, i, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, c_pad, CHUNK), idx_fn, memory_space=pltpu.VMEM),
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
    )(block_start, tile_count, payload, out_res, gout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def tile_blend_instances(
    payload, block_start, tile_count, num_features, grid_x, num_tiles,
    tile_capacity, interpret=False,
):
    """Alpha-blend instance-major payload blocks.

    payload: [num_blocks + 1, c_pad, 128] f32 — the final block is a
    trash target for empty tiles (layout in module docstring);
    block_start/tile_count: [num_tiles] int32.
    Returns [num_tiles, 256, F+1].
    """
    return _fwd_call(
        payload, block_start, tile_count, num_features, grid_x, num_tiles,
        tile_capacity, interpret,
    )


def _fwd_rule(payload, block_start, tile_count, num_features, grid_x, num_tiles,
              tile_capacity, interpret):
    out = _fwd_call(
        payload, block_start, tile_count, num_features, grid_x, num_tiles,
        tile_capacity, interpret,
    )
    return out, (payload, block_start, tile_count, out)


def _bwd_rule(num_features, grid_x, num_tiles, tile_capacity, interpret, res, gout):
    payload, block_start, tile_count, out = res
    d_payload = _bwd_call(
        payload, block_start, tile_count, out, gout,
        num_features, grid_x, num_tiles, tile_capacity, interpret,
    )
    return d_payload, None, None


tile_blend_instances.defvjp(_fwd_rule, _bwd_rule)
