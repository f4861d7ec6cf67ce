"""Serving-gap diagnosis (VERDICT r4 item 1): per-tile instance/overdraw
histograms of a TRAINED checkpoint's scene vs the synthetic bench scene.

The trained eval_heldout checkpoint (136k alive, ~1M instances) serves at
~124 ms while the larger bench scene (661k capacity, ~1.25M instances)
takes ~48 ms — this probe quantifies WHERE the extra blend work is:

  * per-tile run-length distribution (p50/p90/p99/max, blend steps),
  * opacity/extent distribution of the alive gaussians (weak far-field
    splats block early termination: alpha ~ 1/255 contributors keep
    T ~ 1 so no block ever terminates),
  * instance demand + step count per test view.

Usage:
  python script/probe_overdraw.py --config configs/eval_heldout.yaml
  python script/probe_overdraw.py --bench       # synthetic bench scene
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def tile_stats(tile_count: np.ndarray, chunk: int = 128):
    tc = tile_count[tile_count > 0]
    steps = int(np.sum(-(-tc // chunk)))
    return {
        "tiles_nonzero": int(tc.size),
        "tiles_total": int(tile_count.size),
        "instances": int(tc.sum()),
        "p50": float(np.percentile(tc, 50)) if tc.size else 0.0,
        "p90": float(np.percentile(tc, 90)) if tc.size else 0.0,
        "p99": float(np.percentile(tc, 99)) if tc.size else 0.0,
        "max": int(tc.max()) if tc.size else 0,
        "blend_steps": steps,
    }


def gauss_stats(params, aux):
    alive = np.asarray(aux.alive)
    op = 1.0 / (1.0 + np.exp(-np.asarray(params.opacity_logit[:, 0])))
    op = op[alive]
    sc = np.exp(np.asarray(params.log_scale))
    ext = sc.max(axis=1)[alive]
    th = 1.0 / 255.0
    return {
        "alive": int(alive.sum()),
        "op_p50": float(np.percentile(op, 50)),
        "op_p10": float(np.percentile(op, 10)),
        "op_lt_2_255": float((op < 2 * th).mean()),
        "op_lt_5_255": float((op < 5 * th).mean()),
        "op_lt_10_255": float((op < 10 * th).mean()),
        "ext_p50": float(np.percentile(ext, 50)),
        "ext_p99": float(np.percentile(ext, 99)),
    }


def probe_views(params, aux, table, pose_data, views, opts, label):
    from street_gaussians_tpu.models.renderer import screen_space
    from street_gaussians_tpu.ops.binning import bin_gaussians_instances

    print(f"=== {label}: {gauss_stats(params.gaussians, aux)}")

    @jax.jit
    def bin_one(frame_inp):
        screen, _ = screen_space(
            params, aux, table, pose_data, frame_inp,
            step=jnp.asarray(10 ** 9), opts=opts,
        )
        cam = frame_inp.cam
        gx, gy = (cam.W + 15) // 16, (cam.H + 15) // 16
        bins = bin_gaussians_instances(
            screen, gx, gy, opts.instance_capacity,
            opts.tile_capacity or opts.instance_capacity,
            interpret=opts.interpret,
        )
        return bins.tile_count, bins.num_instances, bins.overflow

    rows = []
    for v in views:
        tc, ni, ovf = jax.device_get(bin_one(v.frame_input))
        st = tile_stats(np.asarray(tc))
        st["num_instances"] = int(ni)
        st["overflow"] = int(ovf)
        st["view"] = getattr(v, "image_name", "?")
        rows.append(st)
        print(json.dumps(st))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--views", type=int, default=4)
    args = ap.parse_args()

    if args.bench:
        from street_gaussians_tpu.data.synthetic import make_synthetic_scene
        from street_gaussians_tpu.models.renderer import (
            RenderOptions,
            SceneParams,
        )
        from street_gaussians_tpu.models.sky_cubemap import init_sky

        H, W = 1064, 1600
        scene = make_synthetic_scene(
            num_bkgd=220_000, num_actors=4, H=H, W=W,
            background_growth=3.0, actor_growth=3.0,
        )
        params = SceneParams(
            gaussians=scene.params_init,
            actor_pose=scene.pose_params_init,
            sky=init_sky(1024, white_background=False),
            color_correction=None,
            pose_correction=None,
        )
        opts = RenderOptions(
            mode="eval", tile_capacity=1536 * 1024,
            instance_capacity=1536 * 1024,
            interpret=jax.default_backend() == "cpu",
        )
        views = scene.frames[: args.views]

        class _V:  # match the CameraView duck type
            def __init__(self, f, i):
                self.frame_input = f
                self.image_name = f"bench{i}"

        probe_views(
            params, scene.aux, scene.table, scene.pose_data,
            [_V(f, i) for i, f in enumerate(views)], opts, "bench",
        )
        return

    if args.config:
        from street_gaussians_tpu import checkpoint as ckpt_lib
        from street_gaussians_tpu import train_lib
        from street_gaussians_tpu.config import load_config
        from street_gaussians_tpu.runner import (
            build_initial_params,
            build_scene,
            render_opts_from_cfg,
        )

        cfg = load_config(args.config)
        scene = build_scene(cfg)
        params = build_initial_params(cfg, scene)
        state = train_lib.init_train_state(params, scene.aux_init)
        restored, it = ckpt_lib.load_train_state(cfg.trained_model_dir, state)
        assert restored is not None, cfg.trained_model_dir
        state = restored
        print(f"[probe] loaded iteration {it}")
        opts = render_opts_from_cfg(cfg, "eval")
        views = (scene.test_views + scene.train_views)[: args.views]
        probe_views(
            state.params, state.aux, scene.table, scene.pose_data, views,
            opts, f"trained:{cfg.exp_name}",
        )


if __name__ == "__main__":
    main()
