"""Build a COLMAP sparse model from a directory of raw images — the
generic Colmap-scene pipeline for scenes with no known poses.

Re-design of the reference's converter (ref: script/convert.py:20-100,
itself derived from the MipNeRF-360 shell script): feature_extractor ->
exhaustive_matcher -> mapper -> image_undistorter, producing the
`sparse/0` + undistorted `images/` layout that
street_gaussians_tpu.data.static_readers.load_colmap_scene reads
(cfg.data.type 'Colmap').

Differences from the reference: subprocess.run with check=True instead
of unchecked os.system strings, a clean skip (exit 0 + message) when
the `colmap` binary is absent (same gating as
script/waymo/colmap_waymo_full.py), and image pyramids built with
cv2.resize instead of ImageMagick (no external `magick` dependency).

Usage:
    python script/convert.py -s <scene_dir>         # expects <scene_dir>/input/*.jpg
    python script/convert.py -s <scene_dir> --resize  # also images_{2,4,8}/
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd) -> None:
    print("[convert] $", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def build_sparse_model(
    source_path: str,
    camera_model: str = "OPENCV",
    use_gpu: bool = False,
    skip_matching: bool = False,
) -> None:
    """feature_extractor -> exhaustive_matcher -> mapper ->
    image_undistorter (ref: script/convert.py:31-78)."""
    distorted = os.path.join(source_path, "distorted")
    db = os.path.join(distorted, "database.db")
    input_dir = os.path.join(source_path, "input")
    if not os.path.isdir(input_dir):
        raise FileNotFoundError(
            f"{input_dir} not found — put the raw images in <scene>/input/"
        )
    gpu = "1" if use_gpu else "0"

    if not skip_matching:
        os.makedirs(os.path.join(distorted, "sparse"), exist_ok=True)
        run([
            "colmap", "feature_extractor",
            "--database_path", db,
            "--image_path", input_dir,
            "--ImageReader.single_camera", "1",
            "--ImageReader.camera_model", camera_model,
            "--SiftExtraction.use_gpu", gpu,
        ])
        run([
            "colmap", "exhaustive_matcher",
            "--database_path", db,
            "--SiftMatching.use_gpu", gpu,
        ])
        run([
            "colmap", "mapper",
            "--database_path", db,
            "--image_path", input_dir,
            "--output_path", os.path.join(distorted, "sparse"),
            # ref: script/convert.py:58 — the default tolerance slows
            # global bundle adjustment for no accuracy gain here
            "--Mapper.ba_global_function_tolerance=0.000001",
        ])

    # undistort into ideal pinhole intrinsics: writes <scene>/images +
    # <scene>/sparse (ref: script/convert.py:69-78)
    run([
        "colmap", "image_undistorter",
        "--image_path", input_dir,
        "--input_path", os.path.join(distorted, "sparse", "0"),
        "--output_path", source_path,
        "--output_type", "COLMAP",
    ])

    # normalize to sparse/0/ (ref: script/convert.py:80-88)
    sparse = os.path.join(source_path, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for name in os.listdir(sparse):
        if name == "0":
            continue
        shutil.move(
            os.path.join(sparse, name), os.path.join(sparse, "0", name)
        )


def build_image_pyramids(source_path: str) -> None:
    """images_{2,4,8}/ downsampled copies (ref: script/convert.py:90-140,
    which shells out to ImageMagick; cv2 area-resize here)."""
    import cv2

    img_dir = os.path.join(source_path, "images")
    for factor in (2, 4, 8):
        out_dir = os.path.join(source_path, f"images_{factor}")
        os.makedirs(out_dir, exist_ok=True)
        for name in sorted(os.listdir(img_dir)):
            img = cv2.imread(os.path.join(img_dir, name))
            if img is None:
                continue
            h, w = img.shape[:2]
            small = cv2.resize(
                img, (w // factor, h // factor), interpolation=cv2.INTER_AREA
            )
            cv2.imwrite(os.path.join(out_dir, name), small)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("COLMAP converter")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--camera", default="OPENCV")
    parser.add_argument("--use_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--resize", action="store_true")
    args = parser.parse_args(argv)

    if shutil.which("colmap") is None:
        print(
            "[convert] colmap binary not found on PATH — nothing done.\n"
            "[convert] Install COLMAP, or provide an existing sparse "
            "model under <scene>/sparse/0 (data.type 'Colmap' reads it "
            "directly).",
            file=sys.stderr,
        )
        return 0

    build_sparse_model(
        args.source_path, args.camera, args.use_gpu, args.skip_matching
    )
    if args.resize:
        build_image_pyramids(args.source_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
