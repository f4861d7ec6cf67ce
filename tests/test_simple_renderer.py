"""Single-cloud legacy renderer (models/simple_renderer.py) parity.

Covers the reference's `GaussianRenderer` contract
(ref: lib/models/gaussian_renderer.py:18-119): SH path, color-override
path, bg compositing, and the radii/visibility densification filter.
"""

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.models.simple_renderer import render_gaussians
from street_gaussians_tpu.ops.rasterize import RasterizeConfig, render_reference
from street_gaussians_tpu.ops.preprocess import preprocess_gaussians
from street_gaussians_tpu.utils.camera import make_camera

from tests.test_rasterizer import make_scene

CFG = RasterizeConfig(tile_capacity=256, instance_capacity=2 ** 14, interpret=True)


def test_matches_oracle():
    cam, means, scales, quats, opacity, shs = make_scene(jax.random.PRNGKey(3), 300)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    out = render_gaussians(
        cam, means, scales, quats, opacity, shs=shs, sh_degree=2, bg_color=bg, config=CFG
    )
    screen = preprocess_gaussians(
        means, scales, quats, opacity, shs,
        cam.w2c, cam.full_proj, cam.cam_center, cam.H, cam.W,
        cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy, sh_degree=2,
    )
    ref = render_reference(screen, cam.H, cam.W, bg)
    np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=1e-5)
    np.testing.assert_allclose(out["acc"], ref["acc"], atol=1e-5)
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-4)
    # visibility filter contract
    assert out["radii"].shape == (300,)
    assert bool(out["visibility"].any())


def test_color_override_and_bg():
    cam, means, scales, quats, opacity, _ = make_scene(jax.random.PRNGKey(4), 100)
    colors = jnp.ones((100, 3)) * jnp.asarray([1.0, 0.0, 0.0])
    bg = jnp.asarray([0.0, 1.0, 0.0])
    out = render_gaussians(
        cam, means, scales, quats, opacity, colors_precomp=colors, bg_color=bg,
        config=CFG,
    )
    rgb = np.asarray(out["rgb"])
    acc = np.asarray(out["acc"])
    # covered pixels lean red, empty pixels are exactly the green bg
    empty = acc == 0.0
    assert empty.any()
    np.testing.assert_allclose(
        rgb[empty], np.tile([0.0, 1.0, 0.0], (int(empty.sum()), 1)), atol=1e-6
    )
    covered = acc > 0.5
    if covered.any():
        assert rgb[covered][:, 0].mean() > rgb[covered][:, 2].mean()


def test_requires_exactly_one_color_source():
    cam, means, scales, quats, opacity, shs = make_scene(jax.random.PRNGKey(5), 10)
    import pytest

    with pytest.raises(ValueError):
        render_gaussians(cam, means, scales, quats, opacity, config=CFG)
    with pytest.raises(ValueError):
        render_gaussians(
            cam, means, scales, quats, opacity, shs=shs,
            colors_precomp=jnp.zeros((10, 3)), config=CFG,
        )
