"""Learnable sky cubemap with differentiable cube sampling, pure jnp.

TPU-native replacement for the reference's `SkyCubeMap`
(ref: lib/models/sky_cubemap.py:14-125), which samples a 6xRxRx3
parameter cubemap with `nvdiffrast dr.texture(boundary_mode='cube')`.
Here the cube lookup is a face-select + bilinear gather, which XLA
fuses and differentiates; edge handling is clamp-to-face (nvdiffrast
blends across seams — visually negligible at R=1024 and documented as
the one deviation).

Face layout and orientation reproduce nvdiffrast's OpenGL convention as
used by the reference's `cube_to_dir` (sky_cubemap.py:283-291):
  face 0 +x: dir = ( 1, -v, -u)      face 1 -x: dir = (-1, -v,  u)
  face 2 +y: dir = ( u,  1,  v)      face 3 -y: dir = ( u, -1, -v)
  face 4 +z: dir = ( u, -v,  1)      face 5 -z: dir = (-u, -v, -1)
with u, v in [-1, 1] across the face.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.utils.camera import CameraJax, camera_rays


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SkyParams:
    cubemap: jnp.ndarray  # [6, R, R, 3]


def init_sky(resolution: int = 1024, white_background: bool = True) -> SkyParams:
    """White-ε or ε init (ref: sky_cubemap.py:21-27)."""
    eps = 1e-3
    base = 1.0 - eps if white_background else eps
    return SkyParams(
        cubemap=jnp.full((6, resolution, resolution, 3), base, jnp.float32)
    )


def sample_cubemap(cubemap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cube sampling. dirs [..., 3] (need not be normalized);
    returns [..., 3]."""
    R = cubemap.shape[1]
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face selection: largest-magnitude axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    )

    major = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    major = jnp.maximum(major, 1e-12)
    # per-face (u, v) from the inverse of cube_to_dir
    u = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    ) / major
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y)) / major

    # texel grid: u = -1 + (2i+1)/R at texel centers
    px = (u + 1.0) * 0.5 * R - 0.5
    py = (v + 1.0) * 0.5 * R - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, R - 1)
    x1i = jnp.clip(x0i + 1, 0, R - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, R - 1)
    y1i = jnp.clip(y0i + 1, 0, R - 1)

    # flattened linear-index gathers (a single [6*R*R, 3] operand row
    # gather lowers far better on TPU than 3-axis advanced indexing)
    flat = cubemap.reshape(-1, 3)
    base = face * (R * R)
    c00 = jnp.take(flat, base + y0i * R + x0i, axis=0)
    c01 = jnp.take(flat, base + y0i * R + x1i, axis=0)
    c10 = jnp.take(flat, base + y1i * R + x0i, axis=0)
    c11 = jnp.take(flat, base + y1i * R + x1i, axis=0)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def render_sky(
    params: SkyParams,
    cam: CameraJax,
    jitter: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-pixel sky color [H, W, 3], clamped to [0, 1].

    jitter: optional [H, W, 2] sub-pixel ray offsets (train-time
    anti-aliasing, ref: sky_cubemap.py:93-96). The reference evaluates
    only sky-mask pixels at train time as a speed trick; on TPU the
    full-image gather is cheaper than a dynamic mask, and compositing
    multiplies by (1 - acc) anyway.
    """
    dirs = camera_rays(cam, jitter=jitter)
    return jnp.clip(sample_cubemap(params.cubemap, dirs), 0.0, 1.0)


# ---------------------------------------------------------------------------
# latlong export (checkpoint-time, ref: sky_cubemap.py:42-45, 154-191)
# ---------------------------------------------------------------------------


def cubemap_to_latlong(cubemap: jnp.ndarray, res) -> jnp.ndarray:
    """[H, W, 3] equirectangular image (ref: sky_cubemap.py:178-191)."""
    H, W = res
    gy = np.linspace(0.0 + 1.0 / H, 1.0 - 1.0 / H, H)
    gx = np.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W)
    gy, gx = np.meshgrid(gy, gx, indexing="ij")
    sintheta, costheta = np.sin(gy * np.pi), np.cos(gy * np.pi)
    sinphi, cosphi = np.sin(gx * np.pi), np.cos(gx * np.pi)
    dirs = jnp.asarray(
        np.stack([sintheta * sinphi, costheta, -sintheta * cosphi], axis=-1),
        jnp.float32,
    )
    return sample_cubemap(cubemap, dirs)
