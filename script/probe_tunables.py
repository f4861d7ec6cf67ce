"""Sweep Pallas kernel tunables (fill GOUT/CAP, segsum groups) against
the FULL bench-scale train step — chained timing (journal methodology).

Usage:
  python script/probe_tunables.py --fill 512x256 --iters 15
  python script/probe_tunables.py --fill 1024x512

Monkeypatches ops/fill constants BEFORE the step is traced; prints
it/s. Compare >= 2 consistent runs per setting (CLAUDE.md discipline).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fill", default=None, help="GOUTxCAP, e.g. 512x256")
    ap.add_argument("--detile-split", action="store_true")
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args()

    import importlib

    from street_gaussians_tpu.ops import fill as fill_lib

    # the ops package re-exports the rasterize FUNCTION under the same
    # name — fetch the module explicitly
    raster_lib = importlib.import_module("street_gaussians_tpu.ops.rasterize")

    if args.fill:
        g, _, c = args.fill.partition("x")
        fill_lib.GOUT, fill_lib.CAP = int(g), int(c)
    if args.detile_split:
        raster_lib.DETILE_CHANNEL_SPLIT = True
    print(
        f"[probe] fill GOUT={fill_lib.GOUT} CAP={fill_lib.CAP} "
        f"detile_split={raster_lib.DETILE_CHANNEL_SPLIT}",
        file=sys.stderr,
    )

    import jax
    import jax.numpy as jnp

    from street_gaussians_tpu import train_lib
    from street_gaussians_tpu.config import default_config
    from street_gaussians_tpu.data.synthetic import make_synthetic_scene
    from street_gaussians_tpu.models.renderer import (
        RenderOptions,
        SceneParams,
        render_frame,
    )
    from street_gaussians_tpu.models.sky_cubemap import init_sky
    from street_gaussians_tpu.train_lib import GroundTruth

    on_tpu = jax.devices()[0].platform != "cpu"
    H, W = (1064, 1600) if on_tpu else (64, 96)
    scene = make_synthetic_scene(
        num_bkgd=220_000 if on_tpu else 400, num_actors=4, H=H, W=W,
        background_growth=3.0, actor_growth=3.0,
    )
    params = SceneParams(
        gaussians=scene.params_init,
        actor_pose=scene.pose_params_init,
        sky=init_sky(1024 if on_tpu else 32, white_background=False),
        color_correction=None,
        pose_correction=None,
    )
    ic = 1536 * 1024 if on_tpu else 2 ** 13
    opts = RenderOptions(
        mode="train", tile_capacity=ic, instance_capacity=ic,
        interpret=not on_tpu,
    )
    cfg = default_config()
    cfg.optim.lambda_sky = 0.05
    cfg.optim.lambda_depth_lidar = 0.01
    frame = scene.frames[1]
    img = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(0), opts=RenderOptions(
            mode="eval", tile_capacity=ic, instance_capacity=ic,
            interpret=not on_tpu,
        ),
    )["rgb"]
    gt = GroundTruth(
        image=jnp.clip(img + 0.05, 0, 1),
        mask=jnp.ones((H, W, 1), bool),
        sky_mask=jnp.zeros((H, W, 1), bool),
        lidar_depth=jnp.full((H, W), 8.0),
        obj_bound=jnp.zeros((H, W, 1), bool),
        sky_scale=jnp.ones(()),
    )
    step_fn = train_lib.make_train_step(cfg, scene.table, scene.pose_data, opts)
    state = train_lib.init_train_state(params, scene.aux)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, scalars = step_fn(state, frame, gt, sub)
    float(jnp.sum(state.params.gaussians.xyz[:1]))
    t0 = time.time()
    for _ in range(args.iters):
        key, sub = jax.random.split(key)
        state, scalars = step_fn(state, frame, gt, sub)
    float(jnp.sum(state.params.gaussians.xyz[:1]))
    dt = time.time() - t0
    print(f"[probe] {args.iters} iters -> {args.iters / dt:.3f} it/s "
          f"({dt / args.iters * 1000:.1f} ms)")


if __name__ == "__main__":
    main()
