"""Plain single-cloud 3DGS renderer — the reference's legacy API.

Reproduces `GaussianRenderer` (ref: lib/models/gaussian_renderer.py:
18-119): render ONE Gaussian cloud (no scene graph, no actor poses, no
sky) for a camera, with optional color override and scale modifier.
The composite pipeline (models/renderer.py) never uses this; it exists
for parity and as the smallest possible entry point into the rasterizer
for external users (e.g. rendering a raw PLY).

Everything is activated-space: scales are linear (not log), opacities
in [0, 1], quats get normalized by the preprocess.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from street_gaussians_tpu.ops.preprocess import preprocess_gaussians
from street_gaussians_tpu.ops.rasterize import RasterizeConfig, rasterize


def render_gaussians(
    cam,
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    sh_degree: int = 3,
    scaling_modifier: float = 1.0,
    bg_color: Optional[jnp.ndarray] = None,
    alive: Optional[jnp.ndarray] = None,
    extra_features: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
) -> Dict[str, jnp.ndarray]:
    """Render one Gaussian cloud for `cam` (a CameraJax).

    shs: [N, K, 3] band-major SH coefficients, or colors_precomp [N, 3]
    (the reference's override_color path, gaussian_renderer.py:30-36).
    Returns rgb [H,W,3], acc, depth, T, radii [N], visibility [N] bool
    (radii > 0, the densification filter contract of
    gaussian_renderer.py:111-118), plus extra [H,W,S] when requested.
    """
    if (shs is None) == (colors_precomp is None):
        raise ValueError("provide exactly one of shs / colors_precomp")
    if bg_color is None:
        bg_color = jnp.zeros(3, jnp.float32)

    screen = preprocess_gaussians(
        means3d=means3d,
        scales=scales,
        quats=quats,
        opacities=opacities,
        shs=shs,
        cam_w2c=cam.w2c,
        cam_full_proj=cam.full_proj,
        cam_center=cam.cam_center,
        H=cam.H,
        W=cam.W,
        focal_x=cam.focal_x,
        focal_y=cam.focal_y,
        tan_fovx=cam.tan_fovx,
        tan_fovy=cam.tan_fovy,
        sh_degree=sh_degree,
        scale_modifier=scaling_modifier,
        alive=alive,
        colors_precomp=colors_precomp,
    )
    out = rasterize(
        screen, cam.H, cam.W, bg_color, extra_features=extra_features, config=config
    )
    out["radii"] = screen.radius
    out["visibility"] = screen.radius > 0
    return out
