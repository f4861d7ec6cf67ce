"""Known-pose COLMAP triangulation for a converted Waymo sequence.

Port of the reference pipeline (ref: script/waymo/colmap_waymo_full.py:
26-299 run_colmap_waymo): feature extraction with inverted dynamic-object
masks, a created sparse model with the KNOWN camera poses (images.txt /
cameras.txt, SIMPLE_PINHOLE per sensor), database intrinsics update,
exhaustive matching and point triangulation, optional rig bundle
adjustment. Requires the `colmap` binary on PATH; without it this exits
with instructions (the training pipeline runs fine on LiDAR-only
initialization — COLMAP points are an optional background augmentation,
lib/utils/waymo_utils.py:586-610).
"""

import argparse
import json
import os
import shutil
import sqlite3
import subprocess
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from street_gaussians_tpu.data import waymo as waymo_data
from street_gaussians_tpu.data.waymo import (
    get_val_frames,
    image_filename_to_cam,
    load_camera_info,
    rotmat_to_quat_np,
)


def convert_filename(basename: str) -> str:
    """{frame:06d}_{cam}.png -> cam_{cam}/{frame:06d}_{cam}.png"""
    cam = image_filename_to_cam(basename)
    return os.path.join(f"cam_{cam}", basename)


def sh(cmd: list) -> None:
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)


def run_colmap_waymo(
    source_path: str,
    model_path: str,
    cameras=(0, 1, 2),
    selected_frames=None,
    split_test: int = -1,
    split_train: int = 1,
    use_colmap_pose: bool = False,
):
    if shutil.which("colmap") is None:
        print(
            "colmap binary not found on PATH — skipping SfM triangulation.\n"
            "Install COLMAP or drop a triangulated model at "
            f"{model_path}/colmap/triangulated/sparse/model; training works "
            "without it (LiDAR-only background init)."
        )
        return False

    out = waymo_data.generate_dataparser_outputs(
        source_path, selected_frames=selected_frames, cameras=cameras,
        build_pointcloud=False,
    )
    colmap_dir = os.path.join(model_path, "colmap")
    unique_cams = sorted(set(out.cams))
    for sub in ("train_imgs", "test_imgs", "mask"):
        for cam in unique_cams:
            os.makedirs(os.path.join(colmap_dir, sub, f"cam_{cam}"), exist_ok=True)

    num_frames = out.num_frames
    train_frames, test_frames = get_val_frames(
        num_frames,
        test_every=split_test if split_test > 0 else None,
        train_every=split_train if split_train > 0 else None,
    )
    train_set = set(train_frames)

    c2w_dict = {}
    for i, fn in enumerate(out.image_filenames):
        base = os.path.basename(fn)
        rel = convert_filename(base)
        c2w_dict[rel] = out.c2ws[i]
        sub = "train_imgs" if out.frames_idx[i] in train_set else "test_imgs"
        dst = os.path.join(colmap_dir, sub, rel)
        if not os.path.exists(dst):
            shutil.copyfile(fn, dst)
        # inverted dynamic mask (COLMAP masks: 0 = ignore)
        mask_src = os.path.join(source_path, "dynamic_mask", base)
        mask_dst = os.path.join(colmap_dir, "mask", rel + ".png")
        if os.path.exists(mask_src) and not os.path.exists(mask_dst):
            mask = cv2.imread(mask_src)
            cv2.imwrite(mask_dst, (255 - mask).astype(np.uint8))

    db = os.path.join(colmap_dir, "database.db")
    sh([
        "colmap", "feature_extractor",
        "--ImageReader.mask_path", os.path.join(colmap_dir, "mask"),
        "--ImageReader.camera_model", "SIMPLE_PINHOLE",
        "--ImageReader.single_camera_per_folder", "1",
        "--database_path", db,
        "--image_path", os.path.join(colmap_dir, "train_imgs"),
    ])

    # known-pose sparse model (images.txt / cameras.txt)
    model_dir = os.path.join(colmap_dir, "created/sparse/model")
    os.makedirs(model_dir, exist_ok=True)
    conn = sqlite3.connect(db)
    rows = conn.execute("SELECT image_id, name, camera_id FROM images").fetchall()

    with open(os.path.join(model_dir, "images.txt"), "w") as f:
        for image_id, name, _cam_id in rows:
            w2c = np.linalg.inv(c2w_dict[name])
            q = rotmat_to_quat_np(w2c[:3, :3])
            cam = image_filename_to_cam(os.path.basename(name))
            vals = " ".join(str(float(v)) for v in list(q) + list(w2c[:3, 3]))
            f.write(f"{image_id} {vals} {cam} {name}\n\n")

    cam_sizes = {}
    for i, fn in enumerate(out.image_filenames):
        cam = out.cams[i]
        if cam not in cam_sizes:
            img = cv2.imread(fn)
            cam_sizes[cam] = img.shape[:2]
    with open(os.path.join(model_dir, "cameras.txt"), "w") as f:
        for cam in unique_cams:
            K = out.ixts[out.cams.index(cam)]
            h, w = cam_sizes[cam]
            f.write(f"{cam} SIMPLE_PINHOLE {w} {h} {K[0,0]} {K[0,2]} {K[1,2]}\n")
    open(os.path.join(model_dir, "points3D.txt"), "w").close()

    # write the known intrinsics into the database
    cam_to_id = {}
    for _image_id, name, cam_id in rows:
        cam_to_id[image_filename_to_cam(os.path.basename(name))] = cam_id
    for cam in unique_cams:
        K = out.ixts[out.cams.index(cam)]
        params = np.array([K[0, 0], K[0, 2], K[1, 2]], np.float64)
        conn.execute(
            "UPDATE cameras SET params = ? WHERE camera_id = ?",
            (params.tobytes(), cam_to_id[cam]),
        )
    conn.commit()
    conn.close()

    # rig config for optional bundle adjustment
    _, extrinsics, _, _ = load_camera_info(source_path)
    ref_cam = unique_cams[0]
    rig = {"ref_camera_id": ref_cam, "cameras": []}
    for cam in unique_cams:
        rel = np.linalg.inv(extrinsics[cam]) @ extrinsics[ref_cam]
        q = rotmat_to_quat_np(rel[:3, :3])
        rig["cameras"].append(
            {
                "camera_id": cam,
                "image_prefix": f"cam_{cam}",
                "cam_from_rig_rotation": [float(v) for v in q],
                "cam_from_rig_translation": [float(v) for v in rel[:3, 3]],
            }
        )
    rig_path = os.path.join(colmap_dir, "cam_rigid_config.json")
    with open(rig_path, "w") as f:
        json.dump([rig], f, indent=4)

    sh(["colmap", "exhaustive_matcher", "--database_path", db])

    tri_dir = os.path.join(colmap_dir, "triangulated/sparse/model")
    os.makedirs(tri_dir, exist_ok=True)
    sh([
        "colmap", "point_triangulator",
        "--database_path", db,
        "--image_path", os.path.join(colmap_dir, "train_imgs"),
        "--input_path", model_dir,
        "--output_path", tri_dir,
        "--Mapper.ba_refine_focal_length", "0",
        "--Mapper.ba_refine_principal_point", "0",
        "--Mapper.max_extra_param", "0",
        "--clear_points", "0",
        "--Mapper.ba_global_max_num_iterations", "30",
        "--Mapper.filter_max_reproj_error", "4",
        "--Mapper.filter_min_tri_angle", "0.5",
        "--Mapper.tri_min_angle", "0.5",
        "--Mapper.tri_ignore_two_view_tracks", "1",
        "--Mapper.tri_complete_max_reproj_error", "4",
        "--Mapper.tri_continue_max_angle_error", "4",
    ])

    if use_colmap_pose:
        sh([
            "colmap", "rig_bundle_adjuster",
            "--input_path", tri_dir,
            "--output_path", tri_dir,
            "--rig_config_path", rig_path,
            "--estimate_rig_relative_poses", "0",
            "--RigBundleAdjustment.refine_relative_poses", "1",
            "--BundleAdjustment.max_num_iterations", "50",
            "--BundleAdjustment.refine_focal_length", "0",
            "--BundleAdjustment.refine_principal_point", "0",
            "--BundleAdjustment.refine_extra_params", "0",
        ])
    return True


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--source_path", required=True)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--cameras", type=int, nargs="+", default=[0, 1, 2])
    parser.add_argument("--split_test", type=int, default=-1)
    parser.add_argument("--split_train", type=int, default=1)
    parser.add_argument("--use_colmap_pose", action="store_true")
    args = parser.parse_args()
    run_colmap_waymo(
        args.source_path,
        args.model_path,
        cameras=tuple(args.cameras),
        split_test=args.split_test,
        split_train=args.split_train,
        use_colmap_pose=args.use_colmap_pose,
    )
