"""Slow, exact reference rasterizer in pure jnp.

Replicates, per pixel, the semantics of the CUDA tile renderer
(ref: cuda_rasterizer/forward.cu:340-467):

  * Gaussians are blended front-to-back in view-depth order.
  * A Gaussian contributes to a pixel only if the pixel's tile lies in
    the Gaussian's tile rect (this is what tile binning implies).
  * power = -0.5*(A dx^2 + C dy^2) - B dx dy; skipped if power > 0.
  * alpha = min(0.99, opacity * exp(power)); skipped if alpha < 1/255.
  * blending stops (per pixel, sticky) when T*(1-alpha) < 1e-4; the
    triggering Gaussian is NOT blended.
  * outputs: accumulated features (color/depth/semantics), final
    transmittance T.

Differentiable end-to-end via JAX autodiff — this is the gradient
oracle for the Pallas tile kernel. O(N_pixels * N_gaussians): use for
tests and debugging only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from street_gaussians_tpu.ops.preprocess import TILE, GaussianScreenData


class RenderOutput(NamedTuple):
    features: jnp.ndarray  # [H, W, F] accumulated (premultiplied) features
    transmittance: jnp.ndarray  # [H, W] final T


def reference_render(
    screen: GaussianScreenData,
    features: jnp.ndarray,
    H: int,
    W: int,
) -> RenderOutput:
    """features: [N, F] per-Gaussian channels (e.g. rgb+depth+semantics)."""
    n = features.shape[0]

    # depth order (invalid last)
    sort_depth = jnp.where(screen.valid, screen.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)

    mean2d = screen.mean2d[order]
    conic = screen.conic[order]
    opacity = screen.opacity[order]
    valid = screen.valid[order]
    rect_min = screen.rect_min[order]
    rect_max = screen.rect_max[order]
    feats = features[order]

    ys, xs = jnp.mgrid[0:H, 0:W]
    px = xs.astype(jnp.float32).reshape(-1)  # [P]
    py = ys.astype(jnp.float32).reshape(-1)
    tile_x = (xs // TILE).reshape(-1)
    tile_y = (ys // TILE).reshape(-1)

    def step(carry, g):
        T, done, accum = carry
        m2d, con, op, ok, rmin, rmax, f = g

        in_rect = (
            (tile_x >= rmin[0])
            & (tile_x < rmax[0])
            & (tile_y >= rmin[1])
            & (tile_y < rmax[1])
        )
        dx = m2d[0] - px
        dy = m2d[1] - py
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(0.99, op * jnp.exp(jnp.minimum(power, 0.0)))
        active = ok & in_rect & (power <= 0.0) & (alpha >= 1.0 / 255.0) & (~done)

        test_T = T * (1.0 - alpha)
        trigger = active & (test_T < 1e-4)
        blend = active & (~trigger)

        w = jnp.where(blend, alpha * T, 0.0)
        accum = accum + w[:, None] * f[None, :]
        T = jnp.where(blend, test_T, T)
        done = done | trigger
        return (T, done, accum), None

    P = H * W
    init = (
        jnp.ones((P,), jnp.float32),
        jnp.zeros((P,), bool),
        jnp.zeros((P, features.shape[-1]), jnp.float32),
    )
    (T, _, accum), _ = jax.lax.scan(
        step,
        init,
        (mean2d, conic, opacity, valid, rect_min, rect_max, feats),
    )
    return RenderOutput(
        features=accum.reshape(H, W, -1),
        transmittance=T.reshape(H, W),
    )
