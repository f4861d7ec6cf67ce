"""Public rasterization API: preprocess -> binning -> payload gather ->
Pallas tile blend -> image assembly + background compositing.

Functional equivalent of the reference's GaussianRasterizer call
(ref: diff_gaussian_rasterization/__init__.py:181-260 and
lib/models/street_gaussian_renderer.py:122-278), returning the same
channels: rgb, acc (1-T), expected depth, optional semantic planes.

Everything outside `tile_blend` is plain jnp and participates in XLA
autodiff — in particular the payload gather, whose transpose is the
deterministic scatter-add that replaces the CUDA backward's atomics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from street_gaussians_tpu.ops import binning as binning_lib
from street_gaussians_tpu.ops import tile_raster
from street_gaussians_tpu.ops.preprocess import TILE, GaussianScreenData
from street_gaussians_tpu.ops.tile_raster import payload_rows, tile_blend

# probe switch (script/probe_tunables.py): per-channel 2-D de-tiles vs
# the single 5-D tile->image transpose
DETILE_CHANNEL_SPLIT = False


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static capacities for the fixed-shape pipeline."""

    tile_capacity: int = 1024  # max gaussians blended per tile
    instance_capacity: int = 2 ** 20  # max (gaussian, tile) instances
    interpret: bool = False  # run the Pallas kernel in interpreter mode
    # 'instance' = packed instance-major payload + DMA kernel
    # (tile_raster2, the fast path); 'table' = dense [T, K] payload
    # (tile_raster v1, also used as the interpreter-mode path)
    layout: str = "instance"
    # drop (gaussian, tile) instances whose max possible alpha in the
    # tile is provably < 1/255 (binning.bin_gaussians_instances) —
    # contributor-set-exact; config knob render.corner_cull
    corner_cull: bool = True


def _grid_dims(H: int, W: int):
    return (W + TILE - 1) // TILE, (H + TILE - 1) // TILE


import functools

import numpy as _np

from street_gaussians_tpu.ops import segsum as segsum_lib


def _f0(x):
    """Zero cotangent for integer primals."""
    return _np.zeros(x.shape, jax.dtypes.float0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def build_payload_blocks(src, inst_gauss, interpret=False):
    """Gather [N, C] payload rows into packed instance blocks
    [num_blocks + 1, C, CHUNK] (trash block last) with a SCATTER-FREE
    transpose.

    Forward: one consolidated row gather + block transpose. Backward:
    the plain gather's VJP would be a scatter-add of ~3M rows into N
    slots (measured 238 ms on v5e — the moral equivalent of the CUDA
    backward's atomicAdd, ref: backward.cu:568-638). Instead the
    backward (1) radix-sorts the cotangent rows by gaussian id carrying
    all C channels (key-dominated: ~4 ms regardless of payload width),
    then (2) reduces each id-range [g, g+1) on the MXU via
    ops/segsum.py (~5 ms). Deterministic, scatter-free, ~25x the
    scatter-add's speed.
    """
    from street_gaussians_tpu.ops.tile_raster2 import CHUNK as BLK

    valid = inst_gauss >= 0
    safe = jnp.maximum(inst_gauss, 0)
    gathered = jnp.where(valid[:, None], jnp.take(src, safe, axis=0), 0.0)
    S = gathered.shape[0]
    Sp = _round_up(S, BLK)
    if Sp != S:  # capacity not a block multiple: pad with dead rows
        gathered = jnp.pad(gathered, ((0, Sp - S), (0, 0)))
    nb = Sp // BLK
    c_pad = src.shape[1]
    payload = gathered.reshape(nb, BLK, c_pad).transpose(0, 2, 1)
    return jnp.pad(payload, ((0, 1), (0, 0), (0, 0)))  # +1 trash block


def _bpb_fwd(src, inst_gauss, interpret):
    out = build_payload_blocks(src, inst_gauss, interpret)
    return out, (src.shape[0], inst_gauss)


def _bpb_bwd(interpret, res, d_blocks):
    n, inst_gauss = res
    nb1, C, _ = d_blocks.shape  # includes trash block
    cap = 1024
    S_pad = inst_gauss.shape[0]
    Lp = _round_up(S_pad, cap)

    valid = inst_gauss >= 0
    keys = jnp.where(valid, inst_gauss, segsum_lib.BIG)  # [S_pad]
    keys = jnp.pad(keys, (0, Lp - S_pad), constant_values=segsum_lib.BIG)
    # zero invalid rows: the trash block and empty-slot lanes hold
    # uninitialized kernel output, and 0 * NaN = NaN inside the segsum
    # matmul even though their keys fall in no segment
    flats = [
        jnp.pad(
            jnp.where(valid, d_blocks[:, c, :].reshape(-1)[:S_pad], 0.0),
            (0, Lp - S_pad),
        )
        for c in range(C)
    ]
    if interpret:
        srt = jax.lax.sort((keys, *flats), num_keys=1, is_stable=False)
        skeys = srt[0]
        svals = jnp.stack(srt[1:], axis=0)  # [C, Lp]
    else:
        # sort cost scales with operand count: carry the C gradient
        # channels as bf16 PAIRS in u32 words (C/2 arrays instead of C).
        # Bit-neutral on TPU: the segment-sum matmul below runs at
        # default precision, which rounds every addend to bf16 anyway,
        # and the packed round-trip is exactly that rounding
        # (the sky backward uses the same trick; helpers tested).
        assert C % 2 == 0, C
        packed = [
            segsum_lib.pack_bf16_pair(flats[2 * i], flats[2 * i + 1])
            for i in range(C // 2)
        ]
        srt = jax.lax.sort((keys, *packed), num_keys=1, is_stable=False)
        skeys = srt[0]
        svals = jnp.stack(
            [
                h
                for i in range(C // 2)
                for h in segsum_lib.unpack_bf16_pair(srt[1 + i])
            ],
            axis=0,
        )  # [C, Lp]

    group = 256
    Np = _round_up(n, group)
    d_src = segsum_lib.segment_rowsum(
        svals, skeys, num_segments=Np, cap=cap, group=group, interpret=interpret
    )[:, :n]
    return (d_src.T, _f0(inst_gauss))


build_payload_blocks.defvjp(_bpb_fwd, _bpb_bwd)


def rasterize(
    screen: GaussianScreenData,
    H: int,
    W: int,
    bg_color: jnp.ndarray,
    extra_features: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
    absgrad_dummy: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Rasterize preprocessed Gaussians to an image.

    screen: output of `preprocess_gaussians` (all [N, ...]).
    extra_features: optional [N, S] additional blend channels
      (e.g. semantic logits, normals).
    bg_color: [3] background composited as rgb + T * bg
      (ref: forward.cu:462-465).
    absgrad_dummy: optional [N, 2] ZEROS; has no effect on the output,
      but its gradient is the per-pixel-abs viewspace gradient sum
      (|dL/dmx|, |dL/dmy| in pixel units) used by AbsGS densification
      (ref: cuda_rasterizer/backward.cu:624-628 dL_dmean2D.z).

    Returns dict with rgb [H,W,3], acc [H,W], depth [H,W], T [H,W],
    extra [H,W,S] (if requested), plus binning diagnostics.
    """
    grid_x, grid_y = _grid_dims(H, W)
    num_tiles = grid_x * grid_y

    feats = [screen.rgb, screen.depth[:, None]]
    if extra_features is not None:
        feats.append(extra_features)
    features = jnp.concatenate(feats, axis=-1)  # [N, F]
    F = features.shape[-1]

    c_pad = payload_rows(F)
    if config.layout == "instance":
        # ---- instance-major payload (tile_raster2 DMA kernel) ----
        bins = binning_lib.bin_gaussians_instances(
            screen, grid_x, grid_y, config.instance_capacity,
            config.tile_capacity, interpret=config.interpret,
            corner_cull=config.corner_cull,
        )
        # ONE consolidated [N, c_pad] source + one row gather: XLA lowers
        # separate per-channel gathers fused into the surrounding graph
        # as scalar loops (~100x slower on TPU)
        cols = [
            screen.mean2d,
            screen.conic,
            screen.opacity[:, None],
            features,
        ]
        if absgrad_dummy is not None:
            cols.append(absgrad_dummy)
        src = jnp.concatenate(cols, axis=-1)  # [N, 6+F(+2)]
        # reorder: payload wants (mx, my, ca, cb, cc, op, feats..., abs..)
        # src is already in that order by construction
        if src.shape[1] < c_pad:
            src = jnp.pad(src, ((0, 0), (0, c_pad - src.shape[1])))
        payload = build_payload_blocks(
            src, bins.inst_gauss, config.interpret
        )  # [NB + 1, c_pad, 128]

        from street_gaussians_tpu.ops.tile_raster2 import tile_blend_instances

        out = tile_blend_instances(
            payload, bins.tile_start, bins.tile_count, F, grid_x, num_tiles,
            config.tile_capacity, config.interpret,
        )
    else:
        # ---- dense [T, K] payload table (v1 / interpreter path) ----
        bins = binning_lib.bin_gaussians(
            screen, grid_x, grid_y, config.instance_capacity, config.tile_capacity
        )
        idx = bins.tile_gauss  # [num_tiles, K]
        safe = jnp.maximum(idx, 0)
        empty = idx < 0
        mean2d = screen.mean2d[safe]  # [T, K, 2]
        conic = screen.conic[safe]  # [T, K, 3]
        opacity = jnp.where(empty, 0.0, screen.opacity[safe])  # [T, K]
        feat_g = features[safe]  # [T, K, F]

        rows = [
            mean2d[..., 0],
            mean2d[..., 1],
            conic[..., 0],
            conic[..., 1],
            conic[..., 2],
            opacity,
        ] + [feat_g[..., i] for i in range(F)]
        if absgrad_dummy is not None:
            absg = absgrad_dummy[safe]  # [T, K, 2]
            rows += [absg[..., 0], absg[..., 1]]
        else:
            rows += [jnp.zeros_like(opacity), jnp.zeros_like(opacity)]
        payload = jnp.stack(rows, axis=1)  # [T, 6+F+2, K]
        pad = c_pad - payload.shape[1]
        if pad:
            payload = jnp.pad(payload, ((0, 0), (0, pad), (0, 0)))

        out = tile_blend(
            payload, bins.tile_count, F, grid_x, config.interpret
        )  # [T, 256, F+1]

    # ---- image assembly (tile-major [T, 256, F+1] -> [H, W, F+1]) ----
    if DETILE_CHANNEL_SPLIT:
        # per-channel 2-D de-tiles instead of one 5-D transpose (probe
        # variant: the 5-D transpose lowered to two ~1.9 ms layout
        # copies at bench scale, 4.5% of HBM roofline)
        planes = [
            out[:, :, c]
            .reshape(grid_y, grid_x, TILE, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(grid_y * TILE, grid_x * TILE)[:H, :W]
            for c in range(F + 1)
        ]
        img = jnp.stack(planes, axis=-1)
    else:
        img = (
            out.reshape(grid_y, grid_x, TILE, TILE, F + 1)
            .transpose(0, 2, 1, 3, 4)
            .reshape(grid_y * TILE, grid_x * TILE, F + 1)[:H, :W]
        )
    accum = img[..., :F]
    T = img[..., F]

    rgb = accum[..., 0:3] + T[..., None] * bg_color[None, None, :]
    result = {
        "rgb": rgb,
        "depth": accum[..., 3],
        "acc": 1.0 - T,
        "T": T,
        "num_instances": bins.num_instances,
        "overflow": bins.overflow,
        "overflow_instance": bins.overflow_instance,
        "overflow_tile": bins.overflow_tile,
    }
    if extra_features is not None:
        result["extra"] = accum[..., 4:]
    return result


def render_reference(
    screen: GaussianScreenData,
    H: int,
    W: int,
    bg_color: jnp.ndarray,
    extra_features: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Same contract as `rasterize` but via the slow exact oracle."""
    from street_gaussians_tpu.ops.reference_rasterizer import reference_render

    feats = [screen.rgb, screen.depth[:, None]]
    if extra_features is not None:
        feats.append(extra_features)
    features = jnp.concatenate(feats, axis=-1)

    out = reference_render(screen, features, H, W)
    accum, T = out.features, out.transmittance
    result = {
        "rgb": accum[..., 0:3] + T[..., None] * bg_color[None, None, :],
        "depth": accum[..., 3],
        "acc": 1.0 - T,
        "T": T,
    }
    if extra_features is not None:
        result["extra"] = accum[..., 4:]
    return result
