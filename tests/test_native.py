"""Native C++ library parity vs the scipy/numpy reference paths."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from street_gaussians_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.load_native()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def test_knn_parity(lib):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    d2_native = native.knn_mean_sq_dist3(pts)
    tree = cKDTree(pts.astype(np.float64))
    dist, _ = tree.query(pts, k=4, workers=-1)
    d2_exact = np.mean(dist[:, 1:] ** 2, axis=1)
    np.testing.assert_allclose(d2_native, d2_exact, rtol=1e-4, atol=1e-6)


def test_voxel_downsample_parity(lib):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, (20000, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (20000, 3)).astype(np.float32)
    out_p, out_c = native.voxel_downsample(pts, rgb, 0.5)
    # same voxel population as the numpy path
    keys = np.floor(pts / 0.5).astype(np.int64)
    n_vox = len(np.unique(keys, axis=0))
    assert out_p.shape[0] == n_vox
    # voxel means: every output point lies inside its voxel
    k2 = np.floor(out_p / 0.5 + 1e-4).astype(np.int64)
    assert len(np.unique(k2, axis=0)) >= n_vox * 0.99
    assert out_c.min() >= 0 and out_c.max() <= 1


def test_radius_outlier_parity(lib):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2, 2, (3000, 3)).astype(np.float32)
    counts = native.radius_outlier_counts(pts, 0.4)
    tree = cKDTree(pts)
    exact = tree.query_ball_point(pts, r=0.4, workers=-1, return_length=True)
    np.testing.assert_array_equal(counts, exact)
