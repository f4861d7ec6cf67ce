"""Waymo converter round-trip: hand-encoded tfrecord -> converter ->
loader. Exercises the TF-free protobuf wire decoder, range-image
pointcloud projection, tracklet export, and the dataset reader on the
converted output."""

import json
import os
import struct
import subprocess
import sys
import zlib

import numpy as np
import pytest


# ---- minimal protobuf wire ENCODER (test-side only) ----

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(f, wt):
    return _varint((f << 3) | wt)


def f_varint(f, v):
    return _tag(f, 0) + _varint(v)


def f_double(f, v):
    return _tag(f, 1) + struct.pack("<d", v)


def f_float(f, v):
    return _tag(f, 5) + struct.pack("<f", v)


def f_bytes(f, b):
    return _tag(f, 2) + _varint(len(b)) + b


def f_packed_doubles(f, vals):
    return f_bytes(f, b"".join(struct.pack("<d", v) for v in vals))


def matrix_float(data, dims):
    shape = f_bytes(1, b"".join(_varint(d) for d in dims))
    return f_bytes(1, np.asarray(data, "<f4").tobytes()) + f_bytes(2, shape)


def matrix_i32(data, dims):
    shape = f_bytes(1, b"".join(_varint(d) for d in dims))
    packed = b"".join(_varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in np.asarray(data).reshape(-1))
    return f_bytes(1, packed) + f_bytes(2, shape)


def make_frame(frame_id, num_cams=5, H=32, W=48):
    rng = np.random.default_rng(frame_id)
    ctx = b""
    for cam in range(1, num_cams + 1):
        ext = np.eye(4)
        ext[:3, 3] = [1.0, 0.1 * cam, 2.0]
        calib = (
            f_varint(1, cam)
            + f_packed_doubles(2, [40.0, 40.0, W / 2, H / 2, 0, 0, 0, 0, 0])
            + f_bytes(3, f_packed_doubles(1, ext.reshape(-1)))
            + f_varint(4, W)
            + f_varint(5, H)
        )
        ctx += f_bytes(2, calib)
    laser_calib = (
        f_varint(1, 1)
        + f_packed_doubles(2, list(np.linspace(-0.3, 0.1, 8)))
        + f_bytes(5, f_packed_doubles(1, np.eye(4).reshape(-1)))
    )
    ctx += f_bytes(3, laser_calib)

    ego = np.eye(4)
    ego[:3, 3] = [2.0 * frame_id, 0, 0]

    frame = f_bytes(1, ctx)
    frame += f_varint(2, int(1e6 * (100 + 0.1 * frame_id)))
    frame += f_bytes(3, f_packed_doubles(1, ego.reshape(-1)))

    for cam in range(1, num_cams + 1):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        import cv2

        ok, enc = cv2.imencode(".jpg", img)
        cam_img = (
            f_varint(1, cam)
            + f_bytes(2, enc.tobytes())
            + f_bytes(3, f_packed_doubles(1, ego.reshape(-1)))
            + f_double(5, 100 + 0.1 * frame_id + 0.01 * cam)
        )
        frame += f_bytes(4, cam_img)

    # laser: 8x16 range image + camera projections
    Hr, Wr = 8, 16
    ri = np.zeros((Hr, Wr, 4), np.float32)
    ri[:, :, 0] = rng.uniform(2, 30, (Hr, Wr))
    proj = np.zeros((Hr, Wr, 6), np.int64)
    proj[:, :, 0] = rng.integers(1, num_cams + 1, (Hr, Wr))
    proj[:, :, 1] = rng.integers(0, W, (Hr, Wr))
    proj[:, :, 2] = rng.integers(0, H, (Hr, Wr))
    range_image = (
        f_bytes(2, zlib.compress(matrix_float(ri.reshape(-1), [Hr, Wr, 4])))
        + f_bytes(3, zlib.compress(matrix_i32(proj.reshape(-1), [Hr, Wr, 6])))
    )
    frame += f_bytes(5, f_varint(1, 1) + f_bytes(2, range_image))

    # two labels: moving vehicle + static sign
    box_mov = (
        f_double(1, 10.0 + 1.5 * frame_id) + f_double(2, -2.0) + f_double(3, 0.5)
        + f_double(4, 2.0) + f_double(5, 4.5) + f_double(6, 1.6) + f_double(7, 0.1)
    )
    meta = f_float(1, 3.0) + f_float(2, 0.5)
    frame += f_bytes(
        6, f_bytes(1, box_mov) + f_bytes(2, meta) + f_varint(3, 1) + f_bytes(4, b"obj-a")
    )
    box_static = (
        f_double(1, 6.0) + f_double(2, 3.0) + f_double(3, 1.0)
        + f_double(4, 0.4) + f_double(5, 0.4) + f_double(6, 1.0) + f_double(7, 0.0)
    )
    frame += f_bytes(
        6, f_bytes(1, box_static) + f_varint(3, 3) + f_bytes(4, b"obj-b")
    )
    return frame


def write_tfrecord(path, frames):
    with open(path, "wb") as f:
        for data in frames:
            f.write(struct.pack("<Q", len(data)))
            f.write(b"\x00" * 4)
            f.write(data)
            f.write(b"\x00" * 4)


@pytest.fixture(scope="module")
def converted_seq(tmp_path_factory):
    root = tmp_path_factory.mktemp("waymo_raw")
    save = tmp_path_factory.mktemp("waymo_conv")
    tf_path = os.path.join(str(root), "seg-000.tfrecord")
    write_tfrecord(tf_path, [make_frame(i) for i in range(3)])
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, "script/waymo/waymo_converter.py",
            "--root_dir", str(root), "--save_dir", str(save),
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return os.path.join(str(save), "000")


def test_converter_outputs(converted_seq):
    d = converted_seq
    assert len(os.listdir(os.path.join(d, "images"))) == 15  # 3 frames x 5 cams
    assert os.path.exists(os.path.join(d, "intrinsics", "0.txt"))
    assert os.path.exists(os.path.join(d, "ego_pose", "000001_2.txt"))
    intr = np.loadtxt(os.path.join(d, "intrinsics", "0.txt"))
    assert intr[0] == 40.0 and intr[2] == 24.0
    # extrinsic includes the opencv2camera axis swap
    ext = np.loadtxt(os.path.join(d, "extrinsics", "0.txt"))
    assert abs(np.linalg.det(ext[:3, :3]) - 1.0) < 1e-6

    data = np.load(os.path.join(d, "pointcloud.npz"), allow_pickle=True)
    pc = data["pointcloud"].item()
    proj = data["camera_projection"].item()
    assert pc[0].shape[1] == 3 and pc[0].shape[0] == 8 * 16
    assert proj[0].shape == (8 * 16, 6)
    assert proj[0][:, 0].min() >= 0  # converted to 0-based

    with open(os.path.join(d, "track", "track_info.txt")) as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("frame_id")
    # moving vehicle + static sign per frame
    assert len(lines) == 1 + 3 * 2
    assert "vehicle" in lines[1] and "sign" in lines[2]

    with open(os.path.join(d, "track", "track_camera_vis.json")) as f:
        vis = json.load(f)
    assert "0" in vis and "0" in vis["0"]

    with open(os.path.join(d, "timestamps.json")) as f:
        ts = json.load(f)
    assert abs(ts["FRAME"]["000001"] - 100.1) < 1e-6
    assert len(os.listdir(os.path.join(d, "dynamic_mask"))) == 15


def test_loader_reads_converted(converted_seq, monkeypatch):
    from street_gaussians_tpu.config import load_config
    from street_gaussians_tpu.data.dataset import load_waymo_scene

    cfg = load_config()
    cfg.source_path = converted_seq
    cfg.model_path = converted_seq + "_out"
    cfg.data.split_train = 1
    cfg.data.cameras = [0, 1, 2]
    scene = load_waymo_scene(cfg)
    assert scene.table.names[0] == "background"
    # the moving vehicle survived static-object removal; the sign is
    # filtered by class
    assert len(scene.table.names) == 2
    assert scene.metadata["num_frames"] == 3
    assert len(scene.train_views) == 9
