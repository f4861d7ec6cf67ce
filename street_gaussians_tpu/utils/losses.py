"""Image losses: masked L1/L2, PSNR, SSIM — pure jnp.

Matches the reference math (ref: lib/utils/loss_utils.py:21-126).
Images are [H, W, C] (channels-last, the TPU-friendly layout) unless
noted; the reference uses [C, H, W].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean |pred - gt|; with mask [H, W, 1] or broadcastable, averages
    over masked elements only (ref: loss_utils.py:21-36)."""
    diff = jnp.abs(pred - gt)
    if mask is None:
        return jnp.mean(diff)
    mask = jnp.broadcast_to(mask, diff.shape).astype(diff.dtype)
    return jnp.sum(diff * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    diff = (pred - gt) ** 2
    if mask is None:
        return jnp.mean(diff)
    mask = jnp.broadcast_to(mask, diff.shape).astype(diff.dtype)
    return jnp.sum(diff * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """(ref: loss_utils.py:61-78)"""
    mse = l2_loss(pred, gt, mask)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    window_size: int = 11,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SSIM with an 11x11 gaussian window, sigma 1.5, SAME padding —
    the exact recipe of the reference (ref: loss_utils.py:81-126).
    With a mask, out-of-mask pixels are zero-filled before the window
    convolutions and the mean still runs over all pixels — exactly the
    reference's masked path (loss_utils.py:91-98).

    pred/gt: [H, W, C] in [0, 1]; mask broadcastable to them.
    """
    if mask is not None:
        m = jnp.broadcast_to(mask, pred.shape)
        pred = jnp.where(m, pred, 0.0)
        gt = jnp.where(m, gt, 0.0)
    C = pred.shape[-1]
    H, W = pred.shape[0], pred.shape[1]
    win1d = _gaussian_window(window_size, 1.5)
    half = window_size // 2

    def band(n):
        # [n, n] banded matrix B[i, j] = win[j - i + half] (zero outside
        # the band): x @ B is the SAME-padded 1-D window convolution.
        d = (
            jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            - jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        )
        inb = jnp.abs(d) <= half
        w = jnp.take(win1d, jnp.clip(d + half, 0, window_size - 1))
        return jnp.where(inb, w, 0.0)

    Bw = band(W)
    Bh = band(H)

    def conv(img):
        # separable blur as two BANDED MATMULS instead of depthwise
        # convs: a feature_group_count=3 conv uses 3 of the MXU's 128
        # feature lanes (44 ms fwd+bwd for the 5 SSIM blurs at 1600 px);
        # the [.,W]@[W,W] / [.,H]@[H,H] products run at full MXU width
        # and their VJPs are the transposed matmuls. HIGHEST keeps the
        # accumulation ~f32 (bf16x3); identical math up to association.
        x = img.transpose(2, 0, 1)  # [C, H, W]
        x = jax.lax.dot_general(
            x, Bw, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [C, H, W]
        x = jax.lax.dot_general(
            x, Bh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [C, W, H]
        return x.transpose(2, 1, 0)  # [H, W, C]

    mu1 = conv(pred)
    mu2 = conv(gt)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # E[x^2] - mu^2 cancels catastrophically in f32 on near-constant
    # patches and can go NEGATIVE, making the denominator tiny and
    # SSIM >> 1 (observed blowing the train loss to -11). Clamping the
    # variances at 0 and Cauchy-Schwarz-bounding the covariance is a
    # no-op in exact arithmetic.
    sigma1_sq = jnp.maximum(conv(pred * pred) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(conv(gt * gt) - mu2_sq, 0.0)
    sigma12 = conv(pred * gt) - mu12
    # stop_gradient: the bound is a numerical guard (sqrt'(0) = inf)
    bound = jax.lax.stop_gradient(jnp.sqrt(sigma1_sq * sigma2_sq + 1e-12))
    sigma12 = jnp.clip(sigma12, -bound, bound)

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_map = ((2.0 * mu12 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def binary_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Plain BCE on probabilities (used for the sky / acc supervision,
    ref: train.py:106-112)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def entropy_loss(p: jnp.ndarray, mask: jnp.ndarray | None = None, eps: float = 1e-4) -> jnp.ndarray:
    """Binary entropy of opacities (object-acc regularization,
    ref: train.py:114-122)."""
    p = jnp.clip(p, eps, 1.0 - eps)
    ent = -(p * jnp.log(p) + (1.0 - p) * jnp.log(1.0 - p))
    if mask is None:
        return jnp.mean(ent)
    mask = jnp.broadcast_to(mask, ent.shape).astype(ent.dtype)
    return jnp.sum(ent * mask) / jnp.maximum(jnp.sum(mask), 1.0)
