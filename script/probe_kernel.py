"""Ablation probe for the tile-blend kernel at bench scale (TPU only).

Times the production fwd/bwd kernels against variants to locate the
in-kernel bottleneck:
  floor   — DMA + grid overhead only (read block, accumulate 1 row)
  mxu     — prefix products via triangular matmuls on the MXU
            (log-space), freeing the VPU of the two 7-roll chains
  current — production tile_blend_instances

Usage: python script/probe_kernel.py [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from street_gaussians_tpu.ops import binning as binning_lib
from street_gaussians_tpu.ops import tile_raster2 as tr2
from street_gaussians_tpu.ops.tile_raster import (
    ALPHA_MAX,
    ALPHA_MIN,
    CHUNK,
    PAYLOAD_HEADER,
    PIX,
    T_EPS,
)


def timed(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = fn_j(jnp.zeros(()), *args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    t = jnp.ravel(leaf)[0] * 0.0
    float(t)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(t, *args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        t = jnp.ravel(leaf)[0] * 0.0
    float(t)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


# ---------------------------------------------------------------- variants


def _floor_kernel(ts, blks, ios, lasts, wfs, start_ref, cnt_ref, blk_ref,
                  out_ref, acc_s, *, num_features, grid_x):
    F = num_features
    s = pl.program_id(0)
    i = ios[s]

    @pl.when(i == 0)
    def _():
        acc_s[...] = jnp.zeros((PIX, F), jnp.float32)

    @pl.when(i >= 0)
    def _():
        acc_s[...] = acc_s[...] + blk_ref[0, 0:PIX % 8 + 8, :].sum() * jnp.ones(
            (PIX, F), jnp.float32
        )

    @pl.when(lasts[s] == 1)
    def _():
        out_ref[0, :, 0:F] = acc_s[...]
        out_ref[0, :, F : F + 1] = jnp.ones((PIX, 1), jnp.float32)


def _mxu_kernel(ts, blks, ios, lasts, wfs, start_ref, cnt_ref, blk_ref,
                out_ref, T_s, done_s, accum_s, *, num_features, grid_x):
    F = num_features
    s = pl.program_id(0)
    t = ts[s]
    i = ios[s]
    start = start_ref[t]
    cnt = cnt_ref[t]
    nblocks = jnp.where(cnt > 0, (start % CHUNK + cnt + CHUNK - 1) // CHUNK, 0)

    @pl.when(i == 0)
    def _():
        T_s[...] = jnp.ones((PIX, 1), jnp.float32)
        done_s[...] = jnp.zeros((PIX, 1), jnp.float32)
        accum_s[...] = jnp.zeros((PIX, F), jnp.float32)

    @pl.when((i < nblocks) & (jnp.min(done_s[...]) <= 0.0))
    def _():
        px, py = tr2._pixel_coords(t, grid_x)
        T = T_s[...]
        done = done_s[...]
        mx = blk_ref[0, 0:1, :]
        my = blk_ref[0, 1:2, :]
        ca = blk_ref[0, 2:3, :]
        cb = blk_ref[0, 3:4, :]
        cc = blk_ref[0, 4:5, :]
        op = blk_ref[0, 5:6, :]
        dx = mx - px
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        apow = jnp.exp(jnp.minimum(power, 0.0))
        alpha_raw = op * apow
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        sv = tr2._slot_valid(blks[s], start, cnt)
        active = (power <= 0.0) & (alpha >= ALPHA_MIN) & (done <= 0.0) & sv
        a = jnp.where(active, alpha, 0.0)
        logs = jnp.log1p(-a)
        # lower-triangular-inclusive cumsum on the MXU:
        # cums[p, j] = sum_{i<=j} logs[p, i]  = logs @ L, L[i, j] = i<=j
        ii = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
        L = (ii <= jj).astype(jnp.float32)
        cums_incl = jax.lax.dot_general(
            logs, L, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        test_T = T * jnp.exp(cums_incl)
        trigger = (a > 0.0) & (test_T < T_EPS)
        done_cum = jax.lax.dot_general(
            trigger.astype(jnp.float32), L,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) > 0.0
        blend = (a > 0.0) & jnp.logical_not(done_cum)
        w = jnp.where(blend, a * T * jnp.exp(cums_incl - logs), 0.0)
        feat = blk_ref[0, PAYLOAD_HEADER : PAYLOAD_HEADER + F, :]
        accum_s[...] = accum_s[...] + jax.lax.dot_general(
            w, feat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logs_eff = jnp.where(blend, logs, 0.0)
        T_s[...] = T * jnp.exp(jnp.sum(logs_eff, axis=1, keepdims=True))
        done_s[...] = jnp.maximum(
            done, jnp.max(trigger.astype(jnp.float32), axis=1, keepdims=True)
        )

    @pl.when(lasts[s] == 1)
    def _():
        out_ref[0, :, 0:F] = accum_s[...]
        out_ref[0, :, F : F + 1] = T_s[...]


def call_variant(kernel, payload, tile_start, tile_count, F, grid_x, num_tiles):
    nb_total, c_pad, _ = payload.shape
    ts, blksx, ios, lasts, wfs = tr2._flatten_steps(
        tile_start, tile_count, num_tiles, nb_total - 1, nb_total - 1
    )
    MAXC = ts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(MAXC,),
        in_specs=[
            pl.BlockSpec(
                (1, c_pad, CHUNK),
                lambda s, ts_, blk_, io_, la_, wf_, st_, cnt_: (blk_[s], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PIX, F + 1),
            lambda s, ts_, blk_, io_, la_, wf_, st_, cnt_: (ts_[s], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [pltpu.VMEM((PIX, F), jnp.float32)]
            if kernel is _floor_kernel
            else [
                pltpu.VMEM((PIX, 1), jnp.float32),
                pltpu.VMEM((PIX, 1), jnp.float32),
                pltpu.VMEM((PIX, F), jnp.float32),
            ]
        ),
    )
    return pl.pallas_call(
        functools.partial(kernel, num_features=F, grid_x=grid_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, F + 1), jnp.float32),
    )(ts, blksx, ios, lasts, wfs, tile_start, tile_count, payload)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from street_gaussians_tpu.data.synthetic import make_synthetic_scene
    from street_gaussians_tpu.models.renderer import (
        RenderOptions, SceneParams, compose_frame,
    )
    from street_gaussians_tpu.ops.preprocess import preprocess_gaussians
    from street_gaussians_tpu.ops.rasterize import build_payload_blocks
    from street_gaussians_tpu.ops.tile_raster import payload_rows

    H, W = 1064, 1600
    scene = make_synthetic_scene(
        num_bkgd=220_000, num_actors=4, H=H, W=W,
        background_growth=3.0, actor_growth=3.0,
    )
    params = SceneParams(scene.params_init, scene.pose_params_init, None, None, None)
    frame = scene.frames[2]
    cam = frame.cam
    opts = RenderOptions(mode="eval")
    grid_x, grid_y = (W + 15) // 16, (H + 15) // 16
    num_tiles = grid_x * grid_y
    icap = 2 ** 21

    @jax.jit
    def setup(params):
        c = compose_frame(
            params, scene.aux, scene.table, scene.pose_data, frame,
            jnp.asarray(10 ** 9), opts=opts,
        )
        screen = preprocess_gaussians(
            means3d=c["means3d"], scales=c["scales"], quats=c["quats"],
            opacities=c["opacity"], shs=c["shs"], cam_w2c=cam.w2c,
            cam_full_proj=cam.full_proj, cam_center=cam.cam_center,
            H=cam.H, W=cam.W, focal_x=cam.focal_x, focal_y=cam.focal_y,
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            sh_degree=3, alive=c["visible"],
        )
        bins = binning_lib.bin_gaussians_instances(
            screen, grid_x, grid_y, icap, 1024
        )
        features = jnp.concatenate([screen.rgb, screen.depth[:, None]], axis=-1)
        src = jnp.concatenate(
            [screen.mean2d, screen.conic, screen.opacity[:, None], features],
            axis=-1,
        )
        c_pad = payload_rows(features.shape[-1])
        if src.shape[1] < c_pad:
            src = jnp.pad(src, ((0, 0), (0, c_pad - src.shape[1])))
        payload = build_payload_blocks(src, bins.inst_gauss)
        return payload, bins.tile_start, bins.tile_count

    payload, tile_start, tile_count = jax.block_until_ready(setup(params))
    F = 4  # rgb + depth
    nb = payload.shape[0]
    print(f"payload blocks={nb} c_pad={payload.shape[1]} tiles={num_tiles}")
    n_inst = int(jax.device_get(tile_count).sum())
    print(f"instances (with boundary overlap) ~= {n_inst}")

    def run_current(t, payload, ts0, cnt):
        return tr2.tile_blend_instances(
            payload + t * 0.0, ts0, cnt, F, grid_x, num_tiles, 1024
        )

    def run_mxu(t, payload, ts0, cnt):
        return call_variant(_mxu_kernel, payload + t * 0.0, ts0, cnt, F,
                            grid_x, num_tiles)

    def run_floor(t, payload, ts0, cnt):
        return call_variant(_floor_kernel, payload + t * 0.0, ts0, cnt, F,
                            grid_x, num_tiles)

    it = args.iters
    timed("fwd floor (DMA+grid only)", run_floor, payload, tile_start, tile_count, iters=it)
    timed("fwd current (cumprod rolls)", run_current, payload, tile_start, tile_count, iters=it)
    timed("fwd mxu (triangular matmuls)", run_mxu, payload, tile_start, tile_count, iters=it)

    # check mxu variant parity vs current
    a = jax.jit(run_current)(jnp.zeros(()), payload, tile_start, tile_count)
    b = jax.jit(run_mxu)(jnp.zeros(()), payload, tile_start, tile_count)
    import numpy as np
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"max |current - mxu| = {d:.3e}")

    # backward timing
    def run_bwd(t, payload, ts0, cnt):
        def loss(p):
            out = tr2.tile_blend_instances(
                p + t * 0.0, ts0, cnt, F, grid_x, num_tiles, 1024
            )
            return jnp.sum(out * out) * 1e-6
        return jax.grad(loss)(payload)

    timed("fwd+bwd current", run_bwd, payload, tile_start, tile_count, iters=it)


if __name__ == "__main__":
    main()
