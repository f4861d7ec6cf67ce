"""Per-Gaussian screen-space preprocess: projection, EWA 2D covariance,
conic, radius, tile rect, SH->RGB.

Pure jnp, fully vectorized over the N Gaussians — XLA fuses the whole
thing into a handful of elementwise kernels; no Pallas needed here.

The math replicates the reference CUDA preprocess exactly so the
rendered image and gradients are comparable:
  * frustum cull at view z <= 0.2 (ref: cuda_rasterizer/auxiliary.h:139-164)
  * homogeneous divide with +1e-7 (ref: forward.cu:199)
  * cov3D from quat+scale (ref: forward.cu:118-152)
  * EWA Jacobian with 1.3*tan_fov clamp + 0.3px low-pass
    (ref: forward.cu:74-113)
  * radius = ceil(3 sqrt(max eigenvalue)) (ref: forward.cu:229-232)
  * SH evaluated along camera->mean direction, shifted +0.5, clamped >= 0
    (ref: forward.cu:20-71)
  * tile rect via getRect (ref: auxiliary.h:46-56)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from street_gaussians_tpu.utils import sh as sh_utils

TILE = 16  # pixels per tile side (ref: cuda_rasterizer/config.h:17-18)
NEAR_Z = 0.2
LOWPASS = 0.3


class GaussianScreenData(NamedTuple):
    """Screen-space data for every (padded) Gaussian. All [N, ...]."""

    mean2d: jnp.ndarray  # [N, 2] pixel coords
    depth: jnp.ndarray  # [N] view-space z
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray  # [N] float pixel radius (0 for culled)
    rgb: jnp.ndarray  # [N, 3] view-dependent color (clamped >= 0)
    opacity: jnp.ndarray  # [N]
    valid: jnp.ndarray  # [N] bool: survives culling
    rect_min: jnp.ndarray  # [N, 2] int32 tile coords (x, y), inclusive
    rect_max: jnp.ndarray  # [N, 2] int32 tile coords, exclusive
    tiles_touched: jnp.ndarray  # [N] int32 (0 for culled)


def compute_cov3d(scale: jnp.ndarray, quat: jnp.ndarray, scale_mod: float = 1.0) -> jnp.ndarray:
    """[..., 3] scale + [..., 4] quat -> [..., 6] packed upper-tri cov3D
    (xx, xy, xz, yy, yz, zz), matching forward.cu:118-152.

    Fully scalarized (no [N, 3, 3] batched matmuls — XLA pads those tiny
    contractions onto the MXU with terrible utilization; this is pure
    elementwise VPU work)."""
    s = scale * scale_mod
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    # Sigma = R diag(s^2) R^T
    return jnp.stack(
        [
            r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2,
            r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2,
            r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2,
            r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2,
            r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2,
            r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2,
        ],
        axis=-1,
    )


def _compute_cov2d(
    mean3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    w2c: jnp.ndarray,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
) -> jnp.ndarray:
    """EWA projection of the 3D covariance to 2D (ref: forward.cu:74-113).

    mean3d [N,3], cov3d [N,6] packed; returns [N,3] = (cov_xx, cov_xy, cov_yy)
    with the 0.3 px low-pass added.
    """
    R = w2c[:3, :3]
    t = jnp.matmul(mean3d, R.T, precision="highest") + w2c[:3, 3]
    # Culled points (z <= NEAR_Z) never reach this code in the CUDA
    # kernel (early frustum exit, forward.cu:169-171); here everything
    # is vectorized, so their denominators must be sanitized or the
    # inf/NaN they produce poisons gradients via inf * 0 in the VJP.
    tz = jnp.where(t[:, 2] > NEAR_Z, t[:, 2], 1.0)

    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J is the 2x3 Jacobian of the perspective projection at the
    # (fov-clamped) view-space point.
    j00 = focal_x * inv_z
    j02 = -focal_x * txtz * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tytz * inv_z2

    # Fully scalarized M = J R, cov2d = M Sigma M^T (R entries are
    # camera scalars; everything is [N]-elementwise on the VPU — the
    # batched-tiny-matmul formulation wastes the MXU on 3x3 padding).
    a0 = j00 * R[0, 0] + j02 * R[2, 0]
    a1 = j00 * R[0, 1] + j02 * R[2, 1]
    a2 = j00 * R[0, 2] + j02 * R[2, 2]
    b0 = j11 * R[1, 0] + j12 * R[2, 0]
    b1 = j11 * R[1, 1] + j12 * R[2, 1]
    b2 = j11 * R[1, 2] + j12 * R[2, 2]

    xx, xy, xz, yy, yz, zz = (cov3d[:, i] for i in range(6))
    # u = Sigma a, v = Sigma b
    u0 = xx * a0 + xy * a1 + xz * a2
    u1 = xy * a0 + yy * a1 + yz * a2
    u2 = xz * a0 + yz * a1 + zz * a2
    v0 = xx * b0 + xy * b1 + xz * b2
    v1 = xy * b0 + yy * b1 + yz * b2
    v2 = xz * b0 + yz * b1 + zz * b2
    c00 = a0 * u0 + a1 * u1 + a2 * u2
    c01 = b0 * u0 + b1 * u1 + b2 * u2
    c11 = b0 * v0 + b1 * v1 + b2 * v2
    return jnp.stack([c00 + LOWPASS, c01, c11 + LOWPASS], axis=-1)


def preprocess_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    cam_w2c: jnp.ndarray,
    cam_full_proj: jnp.ndarray,
    cam_center: jnp.ndarray,
    H: int,
    W: int,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    alive: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    max_tiles_per_gaussian: Optional[int] = None,
) -> GaussianScreenData:
    """Vectorized preprocess of N Gaussians for one camera.

    shs: [N, K, 3] SH coefficients (band-major, K >= (sh_degree+1)^2), or
    None when colors_precomp [N, 3] is given.
    alive: optional [N] bool — padded/dead slots are culled.
    max_tiles_per_gaussian: clamps the tile rect (centered on the mean) so
    one huge Gaussian cannot blow the instance budget; None = unclamped.
    """
    n = means3d.shape[0]
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE

    # --- frustum cull (view z) ---
    t = jnp.matmul(means3d, cam_w2c[:3, :3].T, precision="highest") + cam_w2c[:3, 3]
    depth = t[:, 2]
    in_front = depth > NEAR_Z

    # --- projection (w sanitized for culled points: the CUDA kernel
    # early-exits before the divide, forward.cu:169-171; the +1e-7 alone
    # matches it for visible points, forward.cu:199) ---
    hom = jnp.matmul(means3d, cam_full_proj[:3, :3].T, precision="highest") + cam_full_proj[:3, 3]
    w_clip = jnp.matmul(means3d, cam_full_proj[3, :3], precision="highest") + cam_full_proj[3, 3]
    w_den = w_clip + 1e-7
    inv_w = 1.0 / jnp.where(in_front, w_den, 1.0)
    ndc = hom * inv_w[:, None]
    mean2d = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * W - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * H - 1.0) * 0.5,
        ],
        axis=-1,
    )

    # --- covariance ---
    if cov3d_precomp is None:
        cov3d = compute_cov3d(scales, quats, scale_modifier)
    else:
        cov3d = cov3d_precomp
    cov2d = _compute_cov2d(means3d, cov3d, cam_w2c, focal_x, focal_y, tan_fovx, tan_fovy)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_valid = det != 0.0
    inv_det = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack(
        [cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det, cov2d[:, 0] * inv_det],
        axis=-1,
    )

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    r3 = 3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0))
    radius = jnp.ceil(r3)

    # --- tile rect: opacity-aware ellipse AABB (tightened from the
    # reference's 3-sigma circle, auxiliary.h:46-56). A pixel blends only
    # if alpha = op * exp(-Q/2) >= 1/255 (Q the conic quadratic), i.e.
    # Q <= qmax = 2 ln(255 op); the reference additionally truncates at
    # the 3-sigma(major) circle. Per-axis extents of (circle INTERSECT
    # ellipse): h = min(3 sigma_major, sqrt(qmax * cov_axis)). Every
    # pixel the circle-binned blend could touch stays covered, so the
    # output is unchanged while anisotropic / low-opacity gaussians
    # touch far fewer tiles (bench scene: 2.05M -> fewer instances, all
    # downstream stages scale with it). +0.01 px guards ulp edges.
    op_n = opacities.reshape(n)
    qmax = jnp.maximum(2.0 * jnp.log(jnp.maximum(255.0 * op_n, 1e-12)), 0.0)
    hx = jnp.minimum(r3, jnp.sqrt(qmax * jnp.maximum(cov2d[:, 0], 0.0))) + 0.01
    hy = jnp.minimum(r3, jnp.sqrt(qmax * jnp.maximum(cov2d[:, 2], 0.0))) + 0.01
    rect_min = jnp.stack(
        [
            jnp.clip(((mean2d[:, 0] - hx) / TILE).astype(jnp.int32), 0, grid_x),
            jnp.clip(((mean2d[:, 1] - hy) / TILE).astype(jnp.int32), 0, grid_y),
        ],
        axis=-1,
    )
    rect_max = jnp.stack(
        [
            jnp.clip(
                ((mean2d[:, 0] + hx + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x
            ),
            jnp.clip(
                ((mean2d[:, 1] + hy + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y
            ),
        ],
        axis=-1,
    )
    if max_tiles_per_gaussian is not None:
        # clamp the rect around the tile containing the mean, keeping the
        # total tile count <= max_tiles_per_gaussian (side <= sqrt(max))
        side = max(1, int(max_tiles_per_gaussian ** 0.5))
        ctr = jnp.clip(
            (mean2d / TILE).astype(jnp.int32),
            jnp.zeros(2, jnp.int32),
            jnp.array([grid_x - 1, grid_y - 1], jnp.int32),
        )
        half = side // 2
        rect_min = jnp.maximum(rect_min, ctr - half)
        rect_max = jnp.minimum(rect_max, ctr + (side - half))
        rect_max = jnp.maximum(rect_max, rect_min)

    rect_wh = rect_max - rect_min
    tiles_touched = rect_wh[:, 0] * rect_wh[:, 1]

    valid = in_front & det_valid & (tiles_touched > 0)
    if alive is not None:
        valid = valid & alive

    # --- color ---
    if colors_precomp is None:
        assert shs is not None
        dirs = means3d - cam_center[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        basis = sh_utils.sh_basis(sh_degree, dirs)  # [N, K']
        k = basis.shape[-1]
        rgb = jnp.einsum("nk,nkc->nc", basis, shs[:, :k, :], precision="highest") + 0.5
        rgb = jnp.maximum(rgb, 0.0)
    else:
        rgb = colors_precomp

    zero = jnp.zeros((), means3d.dtype)
    return GaussianScreenData(
        mean2d=mean2d,
        depth=jnp.where(valid, depth, zero),
        conic=conic,
        radius=jnp.where(valid, radius, zero),
        rgb=rgb,
        opacity=opacities.reshape(n),
        valid=valid,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=jnp.where(valid, tiles_touched, 0).astype(jnp.int32),
    )


def clip_screen_to_rows(
    screen: GaussianScreenData, tile_row_start, num_tile_rows: int
) -> GaussianScreenData:
    """Restrict preprocessed gaussians to a horizontal band of tile rows
    — the per-device view for row(tile)-sharded rendering
    (parallel/tiles.py). `tile_row_start` may be traced (device index *
    rows-per-device); `num_tile_rows` is static.

    Shifts mean2d.y into the band's local pixel frame and re-clips the
    tile rects; gaussians whose rect misses the band become invalid.
    No reference analog — the CUDA renderer is single-GPU.
    """
    y_off = (tile_row_start * TILE).astype(jnp.float32)
    mean2d = screen.mean2d - jnp.stack(
        [jnp.zeros((), jnp.float32), y_off]
    )[None, :]
    rmin_y = jnp.clip(screen.rect_min[:, 1] - tile_row_start, 0, num_tile_rows)
    rmax_y = jnp.clip(screen.rect_max[:, 1] - tile_row_start, 0, num_tile_rows)
    rect_min = jnp.stack([screen.rect_min[:, 0], rmin_y], axis=-1)
    rect_max = jnp.stack([screen.rect_max[:, 0], rmax_y], axis=-1)
    wh = rect_max - rect_min
    tiles = wh[:, 0] * wh[:, 1]
    valid = screen.valid & (tiles > 0)
    return screen._replace(
        mean2d=mean2d,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=jnp.where(valid, tiles, 0).astype(jnp.int32),
        valid=valid,
        radius=jnp.where(valid, screen.radius, 0.0),
    )
