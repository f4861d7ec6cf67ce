"""Build a self-consistent demo scene: a Waymo-format sequence whose
images are RENDERED from a known ground-truth Gaussian scene, so
training has a real reconstruction target (BASELINE.md configs 2-3:
PSNR must climb toward the GT renders).

Steps: write a synthetic Waymo-format sequence (geometry + tracks +
LiDAR), load it, build a ground-truth model from the LiDAR init with
opaque, colorful Gaussians, render every camera, overwrite the images
with the renders. Training then starts from the standard init (opacity
0.1, colors re-sampled from the rendered images) and must recover the
GT appearance.

Usage: python script/make_demo_scene.py --out <dir> [--frames 8] [--cameras 0 1 2]
"""

import argparse
import dataclasses
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--cameras", type=int, nargs="+", default=[0])
    parser.add_argument("--height", type=int, default=320)
    parser.add_argument("--width", type=int, default=480)
    parser.add_argument("--points", type=int, default=20000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from street_gaussians_tpu.config import derive_paths, load_config
    from street_gaussians_tpu.data import synthetic_waymo
    from street_gaussians_tpu.data.dataset import load_waymo_scene
    from street_gaussians_tpu.models.renderer import (
        RenderOptions,
        SceneParams,
        render_frame,
    )
    from street_gaussians_tpu.models import gaussians as G

    rng = np.random.default_rng(args.seed)

    # 1. synthetic geometry in the converter's on-disk format, with a
    #    denser structured LiDAR cloud than the loader-test default
    def dense_points(n):
        # ground plane strips + wall + scattered blobs => structure the
        # renderer can actually reconstruct
        n1, n2, n3 = n // 2, n // 4, n - n // 2 - n // 4
        ground = np.stack(
            [rng.uniform(3, 60, n1), rng.uniform(-18, 18, n1), rng.uniform(-0.1, 0.1, n1)],
            axis=-1,
        )
        wall = np.stack(
            [rng.uniform(3, 60, n2), rng.choice([-18, 18], n2) + rng.normal(0, 0.2, n2),
             rng.uniform(0, 6, n2)],
            axis=-1,
        )
        k = 24
        centers = np.stack(
            [rng.uniform(6, 55, k), rng.uniform(-14, 14, k), rng.uniform(0.3, 2.5, k)],
            axis=-1,
        )
        blobs = centers[rng.integers(0, k, n3)] + rng.normal(0, 0.7, (n3, 3))
        return np.concatenate([ground, wall, blobs]).astype(np.float32)

    # patch the synthetic writer's lidar with the dense cloud
    orig_write = synthetic_waymo.write_synthetic_waymo
    info = orig_write(
        args.out, num_frames=args.frames, cameras=tuple(args.cameras), seed=args.seed
    )
    # overwrite pointcloud.npz with the structured cloud (vehicle frame
    # per frame: subtract ego x-motion)
    pts3d, pts2d = {}, {}
    world = dense_points(args.points)
    for f in range(args.frames):
        ego_x = 2.0 * f
        veh = world.copy()
        veh[:, 0] -= ego_x
        keep = (veh[:, 0] > 2.0) & (veh[:, 0] < 70.0)
        veh = veh[keep]
        n = veh.shape[0]
        proj = np.zeros((n, 6), np.int16)
        proj[:, 0] = rng.choice(list(args.cameras), n)
        proj[:, 1] = rng.integers(0, args.width, n)
        proj[:, 2] = rng.integers(0, args.height, n)
        proj[:, 3] = -1
        pts3d[f] = veh
        pts2d[f] = proj
    np.savez(
        os.path.join(args.out, "pointcloud.npz"),
        pointcloud=np.array(pts3d, dtype=object),
        camera_projection=np.array(pts2d, dtype=object),
    )

    # resize images dir to target resolution (synthetic writer uses 64x96)
    img_dir = os.path.join(args.out, "images")
    for fn in os.listdir(img_dir):
        img = rng.integers(0, 255, (args.height, args.width, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(img_dir, fn), img)
    for sub, val in (("sky_mask", None), ("lidar_depth", None)):
        d = os.path.join(args.out, sub)
        for fn in os.listdir(d):
            os.remove(os.path.join(d, fn))
    # sky mask: top quarter
    for fn in os.listdir(img_dir):
        sky = np.zeros((args.height, args.width), np.uint8)
        sky[: args.height // 4] = 255
        cv2.imwrite(os.path.join(args.out, "sky_mask", fn), sky)
    # fix intrinsics for the new resolution
    for c in range(5):
        np.savetxt(
            os.path.join(args.out, "intrinsics", f"{c}.txt"),
            np.array([300.0, 300.0, args.width / 2, args.height / 2, 0, 0, 0, 0, 0]),
        )

    # 2. load, build GT model, render, overwrite images
    cfg = load_config()
    cfg.source_path = args.out
    cfg.model_path = os.path.join(args.out, "_gt_build")
    derive_paths(cfg)
    cfg.data.type = "Waymo"
    cfg.data.split_train = 1
    cfg.data.cameras = list(args.cameras)
    scene = load_waymo_scene(cfg)

    gt_g = scene.params_init
    # opaque, colorful ground truth
    op = np.full(np.asarray(gt_g.opacity_logit).shape, 2.0, np.float32)
    feat = np.array(gt_g.feat_dc)
    gt_g = dataclasses.replace(
        gt_g,
        opacity_logit=jnp.asarray(op),
        feat_dc=jnp.asarray(feat),
    )
    gt_params = SceneParams(gt_g, scene.pose_params_init, None, None, None)
    opts = RenderOptions(
        mode="eval",
        tile_capacity=1024,
        instance_capacity=2 ** 19,
        interpret=jax.default_backend() == "cpu",
        white_background=False,
    )

    import functools

    @jax.jit
    def render_one(params, aux, fi):
        return render_frame(
            params, aux, scene.table, scene.pose_data, fi,
            step=jnp.asarray(10 ** 9), opts=opts,
        )

    for view in scene.all_views:
        out = render_one(gt_params, scene.aux_init, view.frame_input)
        rgb = np.clip(np.asarray(out["rgb"]), 0, 1)
        # sky region: constant light blue so the sky model has a target
        acc = np.asarray(out["acc"])
        skycol = np.array([0.55, 0.7, 0.9])
        rgb = rgb + (1 - acc[..., None]) * skycol[None, None]
        cv2.imwrite(
            os.path.join(img_dir, f"{view.image_name}.png"),
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8)[..., ::-1],
        )
        # sky mask from the GT transmittance (what the BCE loss expects)
        sky = ((acc < 0.05) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(args.out, "sky_mask", f"{view.image_name}.png"), sky)

    # 3. lidar depth from GT expected depth
    os.makedirs(os.path.join(args.out, "lidar_depth"), exist_ok=True)
    for view in scene.all_views:
        out = render_one(gt_params, scene.aux_init, view.frame_input)
        acc = np.asarray(out["acc"])
        depth = np.asarray(out["depth"]) / np.maximum(acc, 1e-2)
        mask = acc > 0.5
        np.save(
            os.path.join(args.out, "lidar_depth", f"{view.image_name}.npy"),
            {"mask": mask, "value": depth[mask].astype(np.float32)},
        )

    import shutil

    shutil.rmtree(cfg.model_path, ignore_errors=True)
    print(f"demo scene written to {args.out} ({args.frames} frames x {len(args.cameras)} cams @ {args.width}x{args.height})")


if __name__ == "__main__":
    main()
