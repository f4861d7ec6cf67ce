"""Learnable color and pose corrections, pure jnp.

TPU-native equivalents of the reference's `ColorCorrection`
(ref: lib/models/color_correction.py:7-141) and `PoseCorrection`
(ref: lib/models/camera_pose.py:7-122). Both are off by default
(config.py:104, 111) but first-class capabilities.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from street_gaussians_tpu.utils.quaternion import (
    quat_multiply,
    quat_normalize,
    quat_to_rotmat,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ColorCorrectionParams:
    """Per-image (mode 'image') or per-sensor (mode 'sensor') 3x4 affine
    color transforms (ref: color_correction.py:52-53). The MLP variant
    (use_mlp) is intentionally not reproduced — the reference marks it
    untested and never enables it."""

    affine: jnp.ndarray  # [N, 3, 4]
    affine_sky: jnp.ndarray  # [N, 3, 4]


def init_color_correction(num: int) -> ColorCorrectionParams:
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32)[:3], (num, 3, 4))
    return ColorCorrectionParams(affine=eye, affine_sky=eye)


def apply_color_correction(
    params: ColorCorrectionParams,
    idx,
    rgb: jnp.ndarray,
    use_sky_matrix: bool = False,
) -> jnp.ndarray:
    """rgb [H, W, 3] -> corrected [H, W, 3]
    (ref: color_correction.py:129-132: einsum of [3,4] with homogeneous rgb)."""
    mat = (params.affine_sky if use_sky_matrix else params.affine)[idx]  # [3, 4]
    return rgb @ mat[:, :3].T + mat[:, 3]


def color_correction_reg(params: ColorCorrectionParams, idx) -> jnp.ndarray:
    """Identity regularization (ref: color_correction.py:134-140)."""
    eye = jnp.eye(4, dtype=jnp.float32)[:3]
    return jnp.abs(params.affine[idx] - eye).mean() + jnp.abs(
        params.affine_sky[idx] - eye
    ).mean()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseCorrectionParams:
    """Per-image (or per-frame) SE(3) correction applied to the
    *background Gaussians*, not the camera (ref: camera_pose.py:89-114)."""

    trans: jnp.ndarray  # [N, 3]
    rots: jnp.ndarray  # [N, 4] (w, x, y, z), init identity


def init_pose_correction(num: int) -> PoseCorrectionParams:
    rots = jnp.zeros((num, 4), jnp.float32).at[:, 0].set(1.0)
    return PoseCorrectionParams(trans=jnp.zeros((num, 3), jnp.float32), rots=rots)


def correct_gaussian_xyz(
    params: Optional[PoseCorrectionParams], idx, xyz: jnp.ndarray
) -> jnp.ndarray:
    """(ref: camera_pose.py:89-107)"""
    if params is None:
        return xyz
    q = quat_normalize(params.rots[idx])
    R = quat_to_rotmat(q)
    return xyz @ R.T + params.trans[idx][None, :]


def correct_gaussian_rotation(
    params: Optional[PoseCorrectionParams], idx, rot: jnp.ndarray
) -> jnp.ndarray:
    """(ref: camera_pose.py:109-114)"""
    if params is None:
        return rot
    q = quat_normalize(params.rots[idx])
    return quat_multiply(q[None, :], rot)


def pose_correction_reg(params: PoseCorrectionParams) -> jnp.ndarray:
    """(ref: camera_pose.py:116-121)"""
    loss_trans = jnp.abs(params.trans).mean()
    rots_norm = quat_normalize(params.rots)
    target = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
    return loss_trans + jnp.abs(rots_norm - target[None, :]).mean()
