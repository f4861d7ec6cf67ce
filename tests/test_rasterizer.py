"""Parity tests: Pallas tile rasterizer vs. the slow exact oracle.

The oracle (`reference_render`) replicates the CUDA blend semantics per
pixel and is differentiated by JAX autodiff; the tile path must match it
in both outputs and gradients. Runs in Pallas interpreter mode on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_tpu.ops.preprocess import preprocess_gaussians
from street_gaussians_tpu.ops.rasterize import (
    RasterizeConfig,
    rasterize,
    render_reference,
)
from street_gaussians_tpu.utils.camera import make_camera


def make_scene(key, n, H=48, W=64, opacity_max=0.9, spread=1.2):
    """Random Gaussians in front of a simple pinhole camera."""
    ks = jax.random.split(key, 6)
    focal = 60.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    cam = make_camera(K, w2c, H, W)

    means = jnp.stack(
        [
            jax.random.uniform(ks[0], (n,), minval=-spread, maxval=spread),
            jax.random.uniform(ks[1], (n,), minval=-spread, maxval=spread),
            jax.random.uniform(ks[2], (n,), minval=1.0, maxval=6.0),
        ],
        axis=-1,
    )
    scales = jax.random.uniform(ks[3], (n, 3), minval=0.02, maxval=0.15)
    quats = jax.random.normal(ks[4], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = jax.random.uniform(ks[5], (n,), minval=0.2, maxval=opacity_max)
    shs = jax.random.normal(jax.random.PRNGKey(99), (n, 16, 3)) * 0.3
    return cam, means, scales, quats, opacity, shs


def run_preprocess(cam, means, scales, quats, opacity, shs, sh_degree=2):
    return preprocess_gaussians(
        means,
        scales,
        quats,
        opacity,
        shs,
        cam.w2c,
        cam.full_proj,
        cam.cam_center,
        cam.H,
        cam.W,
        cam.focal_x,
        cam.focal_y,
        cam.tan_fovx,
        cam.tan_fovy,
        sh_degree=sh_degree,
    )


CFG = RasterizeConfig(tile_capacity=256, instance_capacity=2 ** 14, interpret=True)


class TestPreprocess:
    def test_center_gaussian_projects_to_center(self):
        H, W = 32, 32
        K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
        cam = make_camera(K, np.eye(4, dtype=np.float32), H, W)
        means = jnp.array([[0.0, 0.0, 2.0]])
        scales = jnp.full((1, 3), 0.1)
        quats = jnp.array([[1.0, 0, 0, 0]])
        screen = run_preprocess(cam, means, scales, quats, jnp.array([0.8]), jnp.zeros((1, 16, 3)))
        assert bool(screen.valid[0])
        # center pixel: ndc 0 -> (0+1)*32-1)/2 = 15.5
        np.testing.assert_allclose(screen.mean2d[0], [15.5, 15.5], atol=1e-3)
        np.testing.assert_allclose(screen.depth[0], 2.0, atol=1e-5)

    def test_behind_camera_culled(self):
        H, W = 32, 32
        K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
        cam = make_camera(K, np.eye(4, dtype=np.float32), H, W)
        means = jnp.array([[0.0, 0.0, -2.0], [0.0, 0.0, 0.1]])
        screen = run_preprocess(
            cam,
            means,
            jnp.full((2, 3), 0.1),
            jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
            jnp.array([0.8, 0.8]),
            jnp.zeros((2, 16, 3)),
        )
        assert not bool(screen.valid[0])
        assert not bool(screen.valid[1])

    def test_isotropic_conic(self):
        # an isotropic gaussian far from the image border has an
        # isotropic conic: a == c, b ~ 0
        H, W = 64, 64
        K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]], np.float32)
        cam = make_camera(K, np.eye(4, dtype=np.float32), H, W)
        screen = run_preprocess(
            cam,
            jnp.array([[0.0, 0.0, 3.0]]),
            jnp.full((1, 3), 0.2),
            jnp.array([[1.0, 0, 0, 0]]),
            jnp.array([0.9]),
            jnp.zeros((1, 16, 3)),
        )
        a, b, c = (float(screen.conic[0, i]) for i in range(3))
        assert abs(a - c) < 1e-4 * abs(a)
        assert abs(b) < 1e-6
        # cov2d = (f*s/z)^2 + 0.3 -> conic = 1/cov
        expect = 1.0 / ((80.0 * 0.2 / 3.0) ** 2 + 0.3)
        np.testing.assert_allclose(a, expect, rtol=1e-4)


class TestTileVsOracle:
    @pytest.mark.parametrize("n", [50, 400])
    def test_forward_parity(self, n):
        cam, *g = make_scene(jax.random.PRNGKey(0), n)
        screen = run_preprocess(cam, *g)
        bg = jnp.array([0.1, 0.2, 0.3])
        ref = render_reference(screen, cam.H, cam.W, bg)
        out = rasterize(screen, cam.H, cam.W, bg, config=CFG)
        assert int(out["overflow"]) == 0
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=2e-5)
        np.testing.assert_allclose(out["depth"], ref["depth"], atol=2e-4)
        np.testing.assert_allclose(out["acc"], ref["acc"], atol=2e-5)

    def test_forward_parity_high_opacity_termination(self):
        # opacities near 1 exercise the T<1e-4 early-termination path
        cam, *g = make_scene(jax.random.PRNGKey(1), 300, opacity_max=0.999)
        screen = run_preprocess(cam, *g)
        bg = jnp.zeros(3)
        ref = render_reference(screen, cam.H, cam.W, bg)
        out = rasterize(screen, cam.H, cam.W, bg, config=CFG)
        np.testing.assert_allclose(out["rgb"], ref["rgb"], atol=5e-5)
        np.testing.assert_allclose(out["acc"], ref["acc"], atol=5e-5)

    def test_semantic_channels(self):
        cam, *g = make_scene(jax.random.PRNGKey(2), 80)
        screen = run_preprocess(cam, *g)
        sem = jax.random.normal(jax.random.PRNGKey(3), (80, 5))
        bg = jnp.zeros(3)
        ref = render_reference(screen, cam.H, cam.W, bg, extra_features=sem)
        out = rasterize(screen, cam.H, cam.W, bg, extra_features=sem, config=CFG)
        np.testing.assert_allclose(out["extra"], ref["extra"], atol=2e-4)

    def test_gradient_parity(self):
        """Pixel-loss gradients w.r.t. all gaussian params match autodiff
        of the oracle — the BASELINE.json allclose gate."""
        cam, means, scales, quats, opacity, shs = make_scene(
            jax.random.PRNGKey(4), 60, H=32, W=32
        )
        bg = jnp.array([0.5, 0.5, 0.5])
        target = jax.random.uniform(jax.random.PRNGKey(5), (32, 32, 3))

        def loss_fn(render):
            def f(means, scales, quats, opacity, shs):
                screen = run_preprocess(cam, means, scales, quats, opacity, shs)
                out = render(screen)
                # touch every output head
                return (
                    jnp.mean((out["rgb"] - target) ** 2)
                    + 0.1 * jnp.mean(out["depth"])
                    + 0.05 * jnp.mean(out["acc"])
                )

            return f

        ref_loss = loss_fn(lambda s: render_reference(s, cam.H, cam.W, bg))
        til_loss = loss_fn(lambda s: rasterize(s, cam.H, cam.W, bg, config=CFG))

        args = (means, scales, quats, opacity, shs)
        ref_val, ref_grads = jax.value_and_grad(ref_loss, argnums=(0, 1, 2, 3, 4))(*args)
        til_val, til_grads = jax.value_and_grad(til_loss, argnums=(0, 1, 2, 3, 4))(*args)

        np.testing.assert_allclose(til_val, ref_val, rtol=1e-5)
        names = ["means", "scales", "quats", "opacity", "shs"]
        for name, rg, tg in zip(names, ref_grads, til_grads):
            scale = np.maximum(np.abs(np.asarray(rg)).max(), 1e-8)
            np.testing.assert_allclose(
                np.asarray(tg) / scale,
                np.asarray(rg) / scale,
                atol=1e-4,
                err_msg=f"grad mismatch: {name}",
            )

    def test_tile_capacity_overflow_drops_farthest(self):
        # with a tiny tile capacity, the nearest gaussians must win
        cam, *g = make_scene(jax.random.PRNGKey(6), 200)
        screen = run_preprocess(cam, *g)
        bg = jnp.zeros(3)
        small = RasterizeConfig(tile_capacity=128, instance_capacity=2 ** 14, interpret=True)
        out = rasterize(screen, cam.H, cam.W, bg, config=small)
        ref = render_reference(screen, cam.H, cam.W, bg)
        # most pixels still match (only deep tiles lose far occluded tail)
        frac_close = float(jnp.mean(jnp.abs(out["rgb"] - ref["rgb"]) < 1e-3))
        assert frac_close > 0.8

    def test_empty_scene(self):
        cam, *g = make_scene(jax.random.PRNGKey(7), 16)
        screen = run_preprocess(cam, *g)
        screen = screen._replace(valid=jnp.zeros_like(screen.valid))
        bg = jnp.array([0.3, 0.6, 0.9])
        out = rasterize(
            screen._replace(tiles_touched=jnp.zeros_like(screen.tiles_touched)),
            cam.H,
            cam.W,
            bg,
            config=CFG,
        )
        np.testing.assert_allclose(
            out["rgb"], jnp.broadcast_to(bg, (cam.H, cam.W, 3)), atol=1e-6
        )
        np.testing.assert_allclose(out["acc"], 0.0, atol=1e-6)
