"""Stage-level profile of the full-model train step at bench scale.

Timing methodology: through the axon tunnel, `block_until_ready` may
not wait for device execution and repeated identical dispatches may be
coalesced, so every stage is timed as a CHAIN — each call consumes a
scalar derived from the previous call's output (forcing sequential,
distinct executions) and the loop ends with a host fetch.

Usage:  python script/profile_step.py [--half] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, iters=10):
    """fn(t, *args) -> pytree; t is a scalar folded into the compute."""
    fn_j = jax.jit(fn)

    def chain_scalar(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.ravel(leaf)[0].astype(jnp.float32) * 0.0

    t = jnp.zeros((), jnp.float32)
    out = fn_j(t, *args)
    t = chain_scalar(out)
    float(t)  # sync after compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(t, *args)
        t = chain_scalar(out)
    float(t)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:9.2f} ms", file=sys.stderr, flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--half", action="store_true", help="880px workload")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--stages",
        default="all",
        help="comma list: compose,prep,bin,fwd,sky,skygrad,grad,step",
    )
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    def on(s):
        return "all" in stages or s in stages

    import dataclasses

    from street_gaussians_tpu.config import default_config
    from street_gaussians_tpu.data.synthetic import make_synthetic_scene
    from street_gaussians_tpu.models.renderer import (
        RenderOptions,
        SceneParams,
        compose_frame,
        render_frame,
    )
    from street_gaussians_tpu.models.sky_cubemap import init_sky, render_sky
    from street_gaussians_tpu.ops import binning as binning_lib
    from street_gaussians_tpu.ops.preprocess import TILE, preprocess_gaussians
    from street_gaussians_tpu import train_lib
    from street_gaussians_tpu.train_lib import GroundTruth

    H, W = (880, 1280) if args.half else (1064, 1600)
    num_bkgd = 150_000 if args.half else 220_000
    tile_capacity = 1024
    instance_capacity = 1536 * 1024

    scene = make_synthetic_scene(
        num_bkgd=num_bkgd, num_actors=4, H=H, W=W,
        background_growth=3.0, actor_growth=3.0,
    )
    params = SceneParams(
        gaussians=scene.params_init,
        actor_pose=scene.pose_params_init,
        sky=init_sky(1024, white_background=False),
        color_correction=None,
        pose_correction=None,
    )
    cfg = default_config()
    cfg.optim.lambda_sky = 0.05
    cfg.optim.lambda_depth_lidar = 0.1
    cfg.optim.lambda_reg = 0.0
    opts = RenderOptions(
        mode="train", tile_capacity=tile_capacity,
        instance_capacity=instance_capacity,
    )
    frame = scene.frames[2]
    step = jnp.asarray(10 ** 9)
    grid_x, grid_y = (W + TILE - 1) // TILE, (H + TILE - 1) // TILE
    it = args.iters
    cam = frame.cam
    max_deg = max(scene.table.sh_degree_bkgd, scene.table.sh_degree_obj)

    def jitter_params(t, params):
        # data-dependent no-op: defeats runtime result caching
        return dataclasses.replace(
            params,
            gaussians=dataclasses.replace(
                params.gaussians, xyz=params.gaussians.xyz + t
            ),
        )

    if on("compose"):
        def f_compose(t, params):
            return compose_frame(
                jitter_params(t, params), scene.aux, scene.table,
                scene.pose_data, frame, step, opts=opts,
            )

        timed("compose", f_compose, params, iters=it)

    def run_prep(t, params):
        c = compose_frame(
            jitter_params(t, params), scene.aux, scene.table, scene.pose_data,
            frame, step, opts=opts,
        )
        return preprocess_gaussians(
            means3d=c["means3d"], scales=c["scales"], quats=c["quats"],
            opacities=c["opacity"], shs=c["shs"], cam_w2c=cam.w2c,
            cam_full_proj=cam.full_proj, cam_center=cam.cam_center,
            H=cam.H, W=cam.W, focal_x=cam.focal_x, focal_y=cam.focal_y,
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            sh_degree=max_deg, alive=c["visible"],
        )

    if on("prep"):
        timed("compose+preprocess", run_prep, params, iters=it)

    if on("bin"):
        screen = jax.jit(run_prep)(jnp.zeros(()), params)

        def f_bin(t, screen):
            screen = screen._replace(depth=screen.depth + t)
            return binning_lib.bin_gaussians_instances(
                screen, grid_x, grid_y, instance_capacity, tile_capacity
            )

        timed("binning", f_bin, screen, iters=it)

    if on("fwd"):
        def f_render(t, params):
            return render_frame(
                jitter_params(t, params), scene.aux, scene.table,
                scene.pose_data, frame, step=step, opts=opts,
            )["rgb"]

        timed("render fwd (full)", f_render, params, iters=it)

    if on("sky"):
        def f_sky(t, params):
            sky = dataclasses.replace(
                params.sky, cubemap=params.sky.cubemap + t
            )
            return render_sky(sky, cam)

        timed("sky fwd", f_sky, params, iters=it)

    if on("skygrad"):
        def f_sky_grad(t, params):
            def loss(p):
                sky = dataclasses.replace(p.sky, cubemap=p.sky.cubemap + t)
                return jnp.sum(render_sky(sky, cam) ** 2) * 1e-3
            return jax.grad(loss)(params).sky.cubemap

        timed("sky fwd+bwd", f_sky_grad, params, iters=it)

    if on("grad"):
        target = jnp.zeros((H, W, 3))

        def f_render_grad(t, params):
            def loss(p):
                out = render_frame(
                    jitter_params(t, p), scene.aux, scene.table,
                    scene.pose_data, frame, step=step, opts=opts,
                )
                return jnp.mean(jnp.abs(out["rgb"] - target)) + 0.1 * jnp.mean(
                    out["depth"]
                )
            return jax.grad(loss)(params).gaussians.xyz

        timed("render fwd+bwd (L1 only)", f_render_grad, params, iters=it)

    if on("loss"):
        from street_gaussians_tpu.utils import losses as L
        from street_gaussians_tpu.train_lib import trimmed_l1_depth

        img_a = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3)
        img_b = img_a[::-1]

        def f_ssim(t, a, b):
            def loss(a):
                return L.ssim(a + t, b)
            return jax.grad(loss)(a)

        timed("SSIM fwd+bwd", f_ssim, img_a, img_b, iters=it)

        depth_map = img_a[..., 0] * 30.0
        dmask = img_b[..., 0:1] > 0.5

        def f_trim(t, d):
            def loss(d):
                return trimmed_l1_depth(d + t, depth_map * 0.9, dmask[..., 0])
            return jax.grad(loss)(d)

        timed("trimmed lidar-depth L1 fwd+bwd", f_trim, depth_map, iters=it)

    if on("eval"):
        # serving path: eval-mode forward with the fast-path knobs
        eval_opts = dataclasses.replace(opts, mode="eval")

        def f_eval(t, params):
            return render_frame(
                jitter_params(t, params), scene.aux, scene.table,
                scene.pose_data, frame, step=step, opts=eval_opts,
            )["rgb"]

        timed("eval render fwd (sky ds=1)", f_eval, params, iters=it)

        eval_ds2 = dataclasses.replace(eval_opts, sky_downsample=2)

        def f_eval2(t, params):
            return render_frame(
                jitter_params(t, params), scene.aux, scene.table,
                scene.pose_data, frame, step=step, opts=eval_ds2,
            )["rgb"]

        timed("eval render fwd (sky ds=2)", f_eval2, params, iters=it)

        def f_sky_eval(t, params):
            sky = dataclasses.replace(
                params.sky, cubemap=params.sky.cubemap + t
            )
            return render_sky(sky, cam, downsample=2)

        timed("sky fwd ds=2 (small grid)", f_sky_eval, params, iters=it)

    if on("opt"):
        from street_gaussians_tpu.optim.adam import adam_update
        from street_gaussians_tpu.train_lib import make_lr_tree
        import jax.tree_util as jtu

        state0 = train_lib.init_train_state(params, scene.aux)
        lr_tree = make_lr_tree(cfg, scene.table, params, scene.aux, jnp.zeros((), jnp.int32))
        mask_tree = jax.tree.map(lambda _: jnp.ones((), jnp.float32), params)
        g = jax.tree.map(jnp.ones_like, params)

        def f_adam(t, params, adam):
            g2 = jax.tree.map(lambda x: x + t, g)
            return adam_update(params, g2, adam, lr_tree, mask_tree)

        timed("adam update (full tree)", f_adam, params, state0.adam, iters=it)

    if on("step"):
        state = train_lib.init_train_state(params, scene.aux)
        step_fn = train_lib.make_train_step(
            cfg, scene.table, scene.pose_data, opts, donate=False
        )
        gt = GroundTruth(
            image=jnp.zeros((H, W, 3)),
            mask=jnp.ones((H, W, 1), bool),
            sky_mask=jnp.zeros((H, W, 1), bool),
            lidar_depth=jnp.ones((H, W)) * 10.0,
            obj_bound=jnp.zeros((H, W, 1), bool),
            sky_scale=jnp.ones(()),
        )
        key = jax.random.PRNGKey(0)

        def f_step(t, state):
            st2 = dataclasses.replace(state, step=state.step + (t > 1e9).astype(jnp.int32))
            s2, _ = step_fn(st2, frame, gt, key)
            return s2

        state, _ = timed("FULL train step", f_step, state, iters=it)

        if args.trace:
            with jax.profiler.trace(args.trace):
                s = state
                for _ in range(3):
                    s = f_step(jnp.zeros(()), s)
                float(jnp.ravel(s.params.gaussians.xyz)[0])
            print(f"trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
