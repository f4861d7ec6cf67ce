"""Pallas TPU tile-blend kernel (forward + custom-VJP backward).

This is the TPU-native replacement for the reference's per-tile CUDA
render kernels (fwd: cuda_rasterizer/forward.cu:340-467, bwd:
cuda_rasterizer/backward.cu:414-641). Key design differences:

  * One grid step per 16x16 image tile; the tile's (depth-ordered,
    fixed-capacity) Gaussian payload is streamed through VMEM in chunks
    of 128 lanes.
  * The alpha-blend recurrence is evaluated 128 Gaussians at a time:
    transmittance prefix products are lane-axis prefix products
    (Hillis-Steele with `pltpu.roll`), and the feature accumulation is
    one [256px, 128g] x [128g, F] matmul per chunk — on the MXU instead
    of per-thread FMAs.
  * The backward pass re-walks the same chunks front-to-back (no
    back-to-front pass and no atomics): the suffix sums the CUDA kernel
    accumulates in reverse are obtained in forward order from the
    identity  suffix_j = (g . Out) - cumsum_incl(u)_j,  with
    u_j = w_j * (feat_j . g). Per-Gaussian gradients leave the kernel as
    per-instance rows; the (differentiable) payload gather outside turns
    them into deterministic scatter-adds.
  * Per-pixel early termination (T < 1e-4, sticky, triggering Gaussian
    not blended) is reproduced exactly; whole chunks are skipped once
    every pixel of the tile has terminated.

Payload layout (per tile, channel-major [C, K] so K=lanes):
  row 0: mean_x   1: mean_y   2: conic_a   3: conic_b   4: conic_c
  row 5: opacity (0 marks an empty slot)
  rows 6..6+F: blend features (rgb, depth, semantics, ...)
  rows 6+F, 6+F+1: zero dummies whose backward rows carry the
    PER-PIXEL-ABS mean2D gradient sums (|dL/dmx|, |dL/dmy| summed over
    pixels before the per-Gaussian reduction) — the AbsGS densification
    signal the CUDA kernel accumulates into dL_dmean2D.z
    (ref: cuda_rasterizer/backward.cu:624-628). The forward ignores
    them; the payload gather's transpose scatter-adds them into a
    [N, 2] dummy input outside.

Output layout (per tile): [256 pixels, F+1] — F accumulated feature
channels then the final transmittance T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PIX = TILE * TILE  # 256 pixels per tile
CHUNK = 128  # gaussians processed per inner step (one lane register)
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
PAYLOAD_HEADER = 6  # rows before the feature rows


ABS_ROWS = 2  # dummy rows for the per-pixel-abs mean2D gradients


def payload_rows(num_features: int) -> int:
    """Total payload rows (incl. the 2 abs-grad dummies), padded up to a
    multiple of 8 (f32 sublanes)."""
    c = PAYLOAD_HEADER + num_features + ABS_ROWS
    return ((c + 7) // 8) * 8


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix-sum along axis=1 (the lane axis) via log2(n)
    shifted adds (Hillis-Steele)."""
    n = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, axis=1)
        x = x + jnp.where(col >= d, shifted, 0.0)
        d *= 2
    return x


def _cumprod_lanes_excl(x: jnp.ndarray) -> jnp.ndarray:
    """EXCLUSIVE prefix-product along the lane axis (out[:, j] =
    prod_{i<j} x[:, i]) via log2(n) shifted multiplies. Direct products
    match the CUDA reference's sequential `T *= (1 - alpha)` recurrence
    (forward.cu:430) and avoid the log1p/exp round-trip the first
    log-space formulation paid (3 extra [PIX, CHUNK] transcendental
    passes per chunk — measured 21% of forward kernel time)."""
    n = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(col >= 1, pltpu.roll(x, 1, axis=1), 1.0)
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, axis=1)
        x = x * jnp.where(col >= d, shifted, 1.0)
        d *= 2
    return x


def _pixel_coords(tile_id, grid_x):
    """Pixel centers of this tile as [PIX, 1] columns (pixel = sublane)."""
    tile_x = tile_id % grid_x
    tile_y = tile_id // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tile_x * TILE + p % TILE).astype(jnp.float32)
    py = (tile_y * TILE + p // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(payload_ref, sl, px, py, done):
    """Shared fwd/bwd chunk math up to the blend decision.

    Returns (a, om, cp_excl, cp_incl, extras): a is the effective alpha
    [PIX, CHUNK] (0 where inactive/terminated), om = 1 - a, cp_excl /
    cp_incl the exclusive/inclusive lane prefix products of om.
    """
    mx = payload_ref[0, 0:1, sl]
    my = payload_ref[0, 1:2, sl]
    ca = payload_ref[0, 2:3, sl]
    cb = payload_ref[0, 3:4, sl]
    cc = payload_ref[0, 4:5, sl]
    op = payload_ref[0, 5:6, sl]

    dx = mx - px  # [PIX, CHUNK]
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    apow = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * apow
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    active = (power <= 0.0) & (alpha >= ALPHA_MIN) & (done <= 0.0)
    a = jnp.where(active, alpha, 0.0)

    om = 1.0 - a  # >= 1 - ALPHA_MAX = 0.01, so products stay positive
    cp_excl = _cumprod_lanes_excl(om)
    return a, om, cp_excl, cp_excl * om, (dx, dy, ca, cb, cc, apow, alpha_raw)


def _blend_masks(a, cp_incl, T):
    """Per-chunk trigger/blend masks given carry transmittance T [PIX,1]."""
    test_T = T * cp_incl  # T after including gaussian j
    trigger = (a > 0.0) & (test_T < T_EPS)
    done_cum = _cumsum_lanes(trigger.astype(jnp.float32)) > 0.0
    blend = (a > 0.0) & jnp.logical_not(done_cum)
    return trigger, blend


def _survived_product(cp_excl, cp_incl, trigger):
    """prod of (1 - a) over the BLENDED lanes, [PIX, 1]: cp_excl at the
    first trigger lane (cp is non-increasing along lanes, so the first
    trigger is the max over trigger lanes), or the full-chunk product
    when no trigger fired. Non-blended a=0 lanes contribute om=1, so
    the all-lane prefix products are reusable as-is. (reduce_prod is
    unimplemented in Mosaic lowering; this needs only max/select.)"""
    last = cp_incl[:, CHUNK - 1 : CHUNK]
    has = jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True) > 0.0
    best = jnp.max(jnp.where(trigger, cp_excl, 0.0), axis=1, keepdims=True)
    return jnp.where(has, best, last)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(count_ref, payload_ref, out_ref, *, num_features, grid_x, capacity):
    F = num_features
    t = pl.program_id(0)
    px, py = _pixel_coords(t, grid_x)
    nchunks = pl.cdiv(count_ref[t], CHUNK)

    def chunk_body(i, carry):
        T, done, accum = carry

        def compute(args):
            T, done, accum = args
            sl = pl.ds(i * CHUNK, CHUNK)
            a, om, cp_excl, cp_incl, _ = _chunk_alpha(payload_ref, sl, px, py, done)
            trigger, blend = _blend_masks(a, cp_incl, T)

            # w_j = a_j * T_in * prod_{i<j}(1-a_i)
            w = jnp.where(blend, a * T * cp_excl, 0.0)
            feat = payload_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, sl]  # [F, CHUNK]
            accum = accum + jax.lax.dot_general(
                w,
                feat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            T = T * _survived_product(cp_excl, cp_incl, trigger)
            done = jnp.maximum(
                done, jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True)
            )
            return T, done, accum

        # skip the chunk entirely once every pixel has terminated
        return jax.lax.cond(jnp.min(done) > 0.0, lambda c: c, compute, carry)

    T0 = jnp.ones((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    accum0 = jnp.zeros((PIX, F), jnp.float32)
    T, done, accum = jax.lax.fori_loop(0, nchunks, chunk_body, (T0, done0, accum0))

    out_ref[0, :, 0:F] = accum
    out_ref[0, :, F : F + 1] = T


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _bwd_kernel(
    count_ref,
    payload_ref,
    out_res_ref,
    gout_ref,
    dpayload_ref,
    *,
    num_features,
    grid_x,
    capacity,
):
    F = num_features
    t = pl.program_id(0)
    px, py = _pixel_coords(t, grid_x)
    nchunks = pl.cdiv(count_ref[t], CHUNK)

    g = gout_ref[0, :, 0:F]  # [PIX, F] dL/d(features)
    gT = gout_ref[0, :, F : F + 1]  # [PIX, 1] dL/dT_final
    out_feat = out_res_ref[0, :, 0:F]
    T_fin = out_res_ref[0, :, F : F + 1]
    # S_total = sum_j u_j = g . Out  (u_j = w_j * (feat_j . g))
    S_total = jnp.sum(g * out_feat, axis=1, keepdims=True)  # [PIX, 1]
    gT_Tfin = gT * T_fin

    dpayload_ref[...] = jnp.zeros(dpayload_ref.shape, jnp.float32)

    def chunk_body(i, carry):
        T, done, u_accum = carry

        def compute(args):
            T, done, u_accum = args
            sl = pl.ds(i * CHUNK, CHUNK)
            a, om, cp_excl, cp_incl, extras = _chunk_alpha(payload_ref, sl, px, py, done)
            dx, dy, ca, cb, cc, apow, alpha_raw = extras
            trigger, blend = _blend_masks(a, cp_incl, T)

            Tprefix = T * cp_excl  # T before gaussian j
            w = jnp.where(blend, a * Tprefix, 0.0)

            feat = payload_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, sl]  # [F, CHUNK]
            # phi_j = feat_j . g per pixel: [PIX, CHUNK]
            phi = jax.lax.dot_general(
                g,
                feat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u = w * phi
            cumsum_u = _cumsum_lanes(u) + u_accum
            suffix = S_total - cumsum_u  # sum_{i>j} u_i (across all chunks)

            da = jnp.where(
                blend,
                Tprefix * phi - (suffix + gT_Tfin) / (1.0 - a),
                0.0,
            )
            # chain through alpha = min(0.99, opacity * exp(power))
            unclamped = alpha_raw <= ALPHA_MAX
            da_eff = jnp.where(unclamped, da, 0.0)
            dpow = alpha_raw * da_eff
            d_op = jnp.sum(apow * da_eff, axis=0, keepdims=True)  # [1, CHUNK]
            d_ca = jnp.sum(-0.5 * dx * dx * dpow, axis=0, keepdims=True)
            d_cb = jnp.sum(-dx * dy * dpow, axis=0, keepdims=True)
            d_cc = jnp.sum(-0.5 * dy * dy * dpow, axis=0, keepdims=True)
            d_mx = jnp.sum(-(ca * dx + cb * dy) * dpow, axis=0, keepdims=True)
            d_my = jnp.sum(-(cc * dy + cb * dx) * dpow, axis=0, keepdims=True)
            # AbsGS: per-pixel abs BEFORE the pixel sum (backward.cu:626-628)
            d_absx = jnp.sum(jnp.abs((ca * dx + cb * dy) * dpow), axis=0, keepdims=True)
            d_absy = jnp.sum(jnp.abs((cc * dy + cb * dx) * dpow), axis=0, keepdims=True)
            # d_feat[f, j] = sum_p g[p, f] * w[p, j]
            d_feat = jax.lax.dot_general(
                g,
                w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            dpayload_ref[0, 0:1, sl] = d_mx
            dpayload_ref[0, 1:2, sl] = d_my
            dpayload_ref[0, 2:3, sl] = d_ca
            dpayload_ref[0, 3:4, sl] = d_cb
            dpayload_ref[0, 4:5, sl] = d_cc
            dpayload_ref[0, 5:6, sl] = d_op
            dpayload_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, sl] = d_feat
            dpayload_ref[0, PAYLOAD_HEADER + F : PAYLOAD_HEADER + F + 1, sl] = d_absx
            dpayload_ref[0, PAYLOAD_HEADER + F + 1 : PAYLOAD_HEADER + F + 2, sl] = d_absy

            T = T * _survived_product(cp_excl, cp_incl, trigger)
            done = jnp.maximum(
                done, jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True)
            )
            u_accum = u_accum + jnp.sum(u, axis=1, keepdims=True)
            return T, done, u_accum

        return jax.lax.cond(jnp.min(done) > 0.0, lambda c: c, compute, carry)

    T0 = jnp.ones((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    u0 = jnp.zeros((PIX, 1), jnp.float32)
    jax.lax.fori_loop(0, nchunks, chunk_body, (T0, done0, u0))


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------


def _fwd_call(payload, tile_count, num_features, grid_x, interpret):
    num_tiles, c_pad, capacity = payload.shape
    F = num_features
    kernel = functools.partial(
        _fwd_kernel, num_features=F, grid_x=grid_x, capacity=capacity
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, c_pad, capacity), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PIX, F + 1), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, F + 1), jnp.float32),
        interpret=interpret,
    )(tile_count, payload)


def _bwd_call(payload, tile_count, out_res, gout, num_features, grid_x, interpret):
    num_tiles, c_pad, capacity = payload.shape
    F = num_features
    kernel = functools.partial(
        _bwd_kernel, num_features=F, grid_x=grid_x, capacity=capacity
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, c_pad, capacity), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, PIX, F + 1), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, PIX, F + 1), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c_pad, capacity), lambda t, c: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, c_pad, capacity), jnp.float32),
        interpret=interpret,
    )(tile_count, payload, out_res, gout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def tile_blend(payload, tile_count, num_features, grid_x, interpret=False):
    """Alpha-blend each tile's Gaussian payload.

    payload: [num_tiles, C_pad, capacity] f32 (layout in module docstring)
    tile_count: [num_tiles] int32 valid entries per tile
    Returns [num_tiles, 256, F+1]: F accumulated channels + final T.
    """
    return _fwd_call(payload, tile_count, num_features, grid_x, interpret)


def _tile_blend_fwd(payload, tile_count, num_features, grid_x, interpret):
    out = _fwd_call(payload, tile_count, num_features, grid_x, interpret)
    return out, (payload, tile_count, out)


def _tile_blend_bwd(num_features, grid_x, interpret, res, gout):
    payload, tile_count, out = res
    d_payload = _bwd_call(
        payload, tile_count, out, gout, num_features, grid_x, interpret
    )
    return d_payload, None


tile_blend.defvjp(_tile_blend_fwd, _tile_blend_bwd)
