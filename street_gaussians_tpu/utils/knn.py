"""Nearest-neighbor distances for Gaussian scale initialization.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2`
(ref: submodules/simple-knn/simple_knn.cu:147-183, used only at model
init, lib/models/gaussian_model.py:63-64): mean *squared* distance to
the 3 nearest neighbors of each point.

Init-time only and therefore host-side: an exact scipy cKDTree query
(the reference's Morton-sorted scan is itself approximate). Returns
numpy; callers convert once when packing device buffers.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def mean_sq_dist_to_3nn(points: np.ndarray) -> np.ndarray:
    """points [N, 3] -> [N] mean squared distance to the 3 nearest
    neighbors (excluding self), clamped to >= 1e-7 like the reference
    (ref: lib/models/gaussian_model.py:63).

    Uses the native C++ Morton-kNN when available (the analog of the
    reference's simple-knn CUDA module), exact cKDTree otherwise."""
    points = np.asarray(points)
    n = points.shape[0]
    if n == 0:
        return np.zeros((0,), np.float32)
    if n >= 4:
        from street_gaussians_tpu import native

        d2 = native.knn_mean_sq_dist3(points)
        if d2 is not None:
            return np.maximum(d2, 1e-7).astype(np.float32)
    k = min(4, n)  # self + up to 3 neighbors
    tree = cKDTree(np.asarray(points, np.float64))
    dist, _ = tree.query(points, k=k, workers=-1)
    if k == 1:
        d2 = np.full((n,), 1e-7)
    else:
        d2 = np.mean(dist[:, 1:] ** 2, axis=1)
    return np.maximum(d2, 1e-7).astype(np.float32)


def initial_log_scales(points: np.ndarray) -> np.ndarray:
    """log(sqrt(mean_sq_dist_3nn)) broadcast to 3 axes: the reference's
    isotropic initial scale (ref: lib/models/gaussian_model.py:63-64)."""
    d2 = mean_sq_dist_to_3nn(points)
    s = np.log(np.sqrt(d2))
    return np.repeat(s[:, None], 3, axis=1).astype(np.float32)
