"""Sparse LiDAR depth maps from a converted Waymo sequence.

Port of the reference preprocessing step (ref:
script/waymo/generate_lidar_depth.py:33-115): for every image, z-buffer
the LiDAR points that project into it (both stored camera projections)
and save `{mask, value}` npy files consumed as the `lidar_depth`
guidance (lib/datasets/waymo_full_readers.py:134-142).

Usage: python script/waymo/generate_lidar_depth.py --datadir <seq_dir>
"""

import argparse
import os
import sys
from glob import glob

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def image_filename_to_cam(x):
    return int(x.split(".")[0][-1])


def image_filename_to_frame(x):
    return int(x.split(".")[0][:6])


def load_calibration(datadir):
    intrinsics, extrinsics = [], []
    for i in range(5):
        intr = np.loadtxt(os.path.join(datadir, "intrinsics", f"{i}.txt"))
        fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
        intrinsics.append(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]]))
        extrinsics.append(np.loadtxt(os.path.join(datadir, "extrinsics", f"{i}.txt")))
    return extrinsics, intrinsics


def generate_lidar_depth(datadir):
    save_dir = os.path.join(datadir, "lidar_depth")
    os.makedirs(save_dir, exist_ok=True)

    image_files = sorted(
        glob(os.path.join(datadir, "images", "*.jpg"))
        + glob(os.path.join(datadir, "images", "*.png"))
    )
    data = np.load(os.path.join(datadir, "pointcloud.npz"), allow_pickle=True)
    pts3d_dict = data["pointcloud"].item()
    pts2d_dict = data["camera_projection"].item()
    extrinsics, _ = load_calibration(datadir)

    for image_filename in image_files:
        image = cv2.imread(image_filename)
        h, w = image.shape[:2]
        base = os.path.basename(image_filename)
        frame = image_filename_to_frame(base)
        cam = image_filename_to_cam(base)

        raw_3d = pts3d_dict[frame]
        raw_2d = np.asarray(pts2d_dict[frame])
        num_pts = raw_3d.shape[0]
        if raw_2d.shape[-1] >= 6:
            # both stored projections (generate_lidar_depth.py:63-66)
            pts_idx = np.repeat(np.arange(num_pts), 2)
            raw_2d = raw_2d.reshape(-1, 3)
        else:
            pts_idx = np.arange(num_pts)
        mask = raw_2d[:, 0] == cam

        points_xyz = raw_3d[pts_idx[mask]]
        points_xyz = np.concatenate(
            [points_xyz, np.ones_like(points_xyz[..., :1])], axis=-1
        )
        w2c = np.linalg.inv(extrinsics[cam])
        points_depth = (points_xyz @ w2c.T)[..., 2]
        valid = points_depth > 0.0

        coords = raw_2d[mask][:, 1:3][valid].round().astype(np.int32)
        coords[:, 0] = np.clip(coords[:, 0], 0, w - 1)
        coords[:, 1] = np.clip(coords[:, 1], 0, h - 1)

        depth = np.full(h * w, np.finfo(np.float32).max)
        np.minimum.at(depth, coords[:, 1] * w + coords[:, 0], points_depth[valid])
        depth[depth >= np.finfo(np.float32).max - 1e-5] = 0
        mask_img = (depth != 0).reshape(h, w)
        np.save(
            os.path.join(save_dir, f"{base.split('.')[0]}.npy"),
            {"mask": mask_img, "value": depth[depth != 0].astype(np.float32)},
        )
    print(f"wrote lidar depth for {len(image_files)} images to {save_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", required=True, type=str)
    args = parser.parse_args()
    generate_lidar_depth(args.datadir)
