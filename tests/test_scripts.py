"""Exercise the offline preprocessing scripts' CLI paths end-to-end on
synthetic data (VERDICT r1 item 8: every parity row needs a test or a
CLI run behind it)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gradient_sky_mask_plausible():
    """The classical sky-mask fallback must find an obvious sky region
    (bright blue, top-connected) and reject dark ground."""
    sys.path.insert(0, os.path.join(REPO, "script", "waymo"))
    from generate_sky_mask import gradient_sky_mask

    H, W = 120, 160
    img = np.zeros((H, W, 3), np.uint8)  # BGR
    img[: H // 2] = (235, 206, 135)  # light blue sky
    img[H // 2 :] = (40, 42, 45)  # dark road
    # a dark building poking into the sky, connected to the ground
    img[20 : H // 2, 100:130] = (30, 30, 35)

    mask = gradient_sky_mask(img) > 0
    sky_region = mask[: H // 4, :90]
    ground_region = mask[3 * H // 4 :]
    building_region = mask[30 : H // 2 - 5, 105:125]
    assert sky_region.mean() > 0.95
    assert ground_region.mean() < 0.05
    assert building_region.mean() < 0.05


def test_generate_sky_mask_cli(tmp_path):
    import cv2

    seq = tmp_path / "seq"
    (seq / "images").mkdir(parents=True)
    H, W = 60, 80
    img = np.zeros((H, W, 3), np.uint8)
    img[: H // 2] = (235, 206, 135)
    img[H // 2 :] = (40, 42, 45)
    cv2.imwrite(str(seq / "images" / "000000_0.png"), img)

    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "script", "waymo", "generate_sky_mask.py"),
            "--datadir",
            str(seq),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    out = seq / "sky_mask" / "000000_0.png"
    assert out.exists()
    mask = cv2.imread(str(out), cv2.IMREAD_GRAYSCALE) > 0
    assert mask[: H // 4].mean() > 0.9
    assert mask[3 * H // 4 :].mean() < 0.1


def test_generate_lidar_depth_cli(tmp_path):
    """Depth script over the synthetic sequence: sparse npy with
    plausible values."""
    from street_gaussians_tpu.data.synthetic_waymo import write_synthetic_waymo

    seq = str(tmp_path / "seq")
    write_synthetic_waymo(seq, num_frames=2, cameras=(0,))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "script", "waymo", "generate_lidar_depth.py"),
            "--datadir",
            seq,
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    depth_dir = os.path.join(seq, "lidar_depth")
    files = sorted(os.listdir(depth_dir))
    assert files
    d = np.load(os.path.join(depth_dir, files[0]), allow_pickle=True).item()
    assert d["mask"].any()
    vals = d["value"]
    assert np.isfinite(vals).all() and (vals > 0).all()


def test_shipped_configs_load():
    """Every shipped config (incl. the parent_cfg-merged experiment
    scenes) must load and carry the eval protocol's key fields
    (ref protocol: configs/experiments_waymo/waymo_val_006.yaml:6-11)."""
    import glob

    from street_gaussians_tpu.config import load_yaml_with_parents

    files = [
        f
        for f in sorted(glob.glob("configs/**/*.yaml", recursive=True))
        if not f.endswith("_base.yaml")
    ]
    assert len(files) >= 10
    for f in files:
        cfg = load_yaml_with_parents(f)
        assert cfg.train.iterations > 0, f
        if "experiments_waymo" in f:
            assert cfg.data.split_test == 4, f
            assert cfg.data.cameras == [0], f
            assert cfg.optim.densify_until_iter == 15000, f


def test_convert_cli_without_colmap(tmp_path, capsys):
    """script/convert.py (generic COLMAP-from-images pipeline, ref:
    script/convert.py:20-100): without the colmap binary it must exit 0
    with a clear skip message, not crash; with images missing it names
    the expected layout."""
    import importlib.util
    import os
    import shutil
    import sys

    spec = importlib.util.spec_from_file_location(
        "convert_cli",
        os.path.join(os.path.dirname(__file__), "..", "script", "convert.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    if shutil.which("colmap") is None:
        rc = mod.main(["-s", str(tmp_path)])
        assert rc == 0
        assert "colmap binary not found" in capsys.readouterr().err
    else:  # colmap present: a scene dir without input/ must fail clearly
        import pytest

        with pytest.raises(FileNotFoundError, match="input"):
            mod.build_sparse_model(str(tmp_path))


def test_convert_image_pyramids(tmp_path):
    """The --resize pyramid builder (cv2-based, no ImageMagick dep)."""
    import importlib.util
    import os

    import cv2
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "convert_cli2",
        os.path.join(os.path.dirname(__file__), "..", "script", "convert.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    img = (np.random.default_rng(0).random((64, 96, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(img_dir / "a.png"), img)
    mod.build_image_pyramids(str(tmp_path))
    for f in (2, 4, 8):
        small = cv2.imread(str(tmp_path / f"images_{f}" / "a.png"))
        assert small.shape == (64 // f, 96 // f, 3)
