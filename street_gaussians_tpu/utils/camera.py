"""Camera model + projection matrices, pure jnp / numpy.

Conventions (all row-vector-free, plain math):
  * w2c is a 4x4 world->camera matrix: p_cam = w2c[:3,:3] @ p + w2c[:3,3]
  * proj is the 4x4 OpenGL-style intrinsic projection built from K
    (ref: lib/utils/graphics_utils.py:72-94 getProjectionMatrixK)
  * full_proj = proj @ w2c; NDC = clip.xyz / (clip.w + 1e-7)
  * pixel center x of NDC v: ((v + 1) * W - 1) / 2
    (ref: cuda_rasterizer/auxiliary.h:41-44 ndc2Pix)

The reference stores the transposed matrices for its CUDA kernels
(lib/utils/camera_utils.py:85-92); here we keep the un-transposed
mathematical convention throughout.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world2view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """R: c2w rotation [3,3] (COLMAP convention), t: w2c translation [3].

    Returns the 4x4 w2c matrix (ref: graphics_utils.py:31-36 getWorld2View,
    which stores R^T in the top-left block).
    """
    m = np.zeros((4, 4), dtype=np.float32)
    m[:3, :3] = R.T
    m[:3, 3] = t
    m[3, 3] = 1.0
    return m


def projection_matrix_from_K(
    K: np.ndarray, H: int, W: int, znear: float = 0.01, zfar: float = 100.0
) -> np.ndarray:
    """Intrinsics K [3,3] -> 4x4 projection (ref: graphics_utils.py:72-94)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * fx / W
    P[0, 1] = 2.0 * s / W
    P[0, 2] = -1.0 + 2.0 * (cx / W)
    P[1, 1] = 2.0 * fy / H
    P[1, 2] = -1.0 + 2.0 * (cy / H)
    P[2, 2] = (zfar + znear) / (zfar - znear)
    P[2, 3] = -2.0 * zfar * znear / (zfar - znear)
    P[3, 2] = 1.0
    return P


def projection_matrix_from_fov(
    fovx: float, fovy: float, znear: float = 0.01, zfar: float = 100.0
) -> np.ndarray:
    """Symmetric-frustum projection (ref: graphics_utils.py:51-70)."""
    tx = math.tan(fovx / 2.0)
    ty = math.tan(fovy / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tx
    P[1, 1] = 1.0 / ty
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def ndc_to_pixel(v: jnp.ndarray, size) -> jnp.ndarray:
    """(ref: cuda_rasterizer/auxiliary.h:41-44)"""
    return ((v + 1.0) * size - 1.0) * 0.5


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraJax:
    """Device-side camera: everything a render step needs, as arrays.

    Static ints (H, W) stay python ints so jit treats them as static.
    """

    w2c: jnp.ndarray  # [4,4] world->camera
    proj: jnp.ndarray  # [4,4] intrinsic projection
    cam_center: jnp.ndarray  # [3] camera origin in world
    K: jnp.ndarray  # [3,3] pixel intrinsics
    H: int = dataclasses.field(metadata=dict(static=True))
    W: int = dataclasses.field(metadata=dict(static=True))
    # scalar per-camera metadata used by the scene graph / sky
    frame: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )  # dataset frame index
    timestamp: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.float32)
    )  # normalized [0,1] time
    cam_id: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )  # sensor index
    image_id: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )  # global image index

    @property
    def full_proj(self) -> jnp.ndarray:
        return self.proj @ self.w2c

    @property
    def tan_fovx(self) -> jnp.ndarray:
        return self.W / (2.0 * self.K[0, 0])

    @property
    def tan_fovy(self) -> jnp.ndarray:
        return self.H / (2.0 * self.K[1, 1])

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.K[0, 0]

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.K[1, 1]


def make_camera(
    K: np.ndarray,
    w2c: np.ndarray,
    H: int,
    W: int,
    znear: float = 0.01,
    zfar: float = 1000.0,
    frame: int = 0,
    timestamp: float = 0.0,
    cam_id: int = 0,
    image_id: int = 0,
) -> CameraJax:
    """Build a device camera from numpy intrinsics/extrinsics."""
    K = np.asarray(K, np.float32)
    w2c = np.asarray(w2c, np.float32)
    c2w = np.linalg.inv(w2c)
    proj = projection_matrix_from_K(K, H, W, znear, zfar)
    return CameraJax(
        w2c=jnp.asarray(w2c),
        proj=jnp.asarray(proj),
        cam_center=jnp.asarray(c2w[:3, 3]),
        K=jnp.asarray(K),
        H=int(H),
        W=int(W),
        frame=jnp.asarray(frame, jnp.int32),
        timestamp=jnp.asarray(timestamp, jnp.float32),
        cam_id=jnp.asarray(cam_id, jnp.int32),
        image_id=jnp.asarray(image_id, jnp.int32),
    )


def camera_rays(
    cam: CameraJax,
    jitter: Optional[jnp.ndarray] = None,
    row_start=None,
    num_rows: Optional[int] = None,
    downsample: int = 1,
) -> jnp.ndarray:
    """Per-pixel unit ray directions in world frame, [H, W, 3].

    jitter: optional [H, W, 2] sub-pixel offsets in [-0.5, 0.5) added to the
    pixel centers (ref: lib/utils/graphics_utils.py:186-207 get_rays /
    sky_cubemap.py:93-96 train-time jitter).
    row_start/num_rows: optional image-row band (row-sharded rendering,
    parallel/tiles.py) — rows [row_start, row_start + num_rows).
    downsample: > 1 returns a [ceil(H/ds), ceil(W/ds), 3] ray grid whose
    sample points sit at the CENTERS of ds x ds pixel groups (continuous
    coord (j + 0.5) * ds), matching `jax.image.resize` bilinear
    alignment — the eval-path half-res sky trick (renderer.render_frame).
    """
    H, W = (num_rows if num_rows is not None else cam.H), cam.W
    r0 = 0 if row_start is None else row_start
    if downsample > 1:
        ds = float(downsample)
        Hs = -(-H // downsample)
        Ws = -(-W // downsample)
        xs = (jnp.arange(Ws, dtype=jnp.float32) + 0.5) * ds - 0.5
        ys = (jnp.arange(Hs, dtype=jnp.float32) + 0.5) * ds - 0.5 + r0
        x = xs[None, :].repeat(Hs, axis=0)
        y = ys[:, None].repeat(Ws, axis=1)
        if jitter is not None:
            raise ValueError("jitter is a train-time feature; downsample is eval-only")
        ones = jnp.ones_like(x)
        pix = jnp.stack([x + 0.5, y + 0.5, ones], axis=-1)
        Kinv = jnp.linalg.inv(cam.K)
        dirs_cam = pix @ Kinv.T
        c2w_rot = cam.w2c[:3, :3].T
        dirs_world = dirs_cam @ c2w_rot.T
        return dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    x = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)
    y = (jnp.arange(H, dtype=jnp.float32) + r0)[:, None].repeat(W, axis=1)
    if jitter is not None:
        x = x + jitter[..., 0]
        y = y + jitter[..., 1]
    ones = jnp.ones_like(x)
    pix = jnp.stack([x + 0.5, y + 0.5, ones], axis=-1)  # pixel centers
    Kinv = jnp.linalg.inv(cam.K)
    dirs_cam = pix @ Kinv.T
    c2w_rot = cam.w2c[:3, :3].T  # inverse of rotation
    dirs_world = dirs_cam @ c2w_rot.T
    return dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
