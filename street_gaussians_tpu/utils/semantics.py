"""Semantic label visualization + vector quantization, pure numpy/jnp.

Re-implementation of the reference's semantic utilities
(ref: lib/utils/sem_utils.py:1-56 label colormaps/visualization,
lib/utils/vq_utils.py:1-65 straight-through vector quantization —
an auxiliary capability outside the main train path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def label_colormap(n_labels: int = 256) -> np.ndarray:
    """Deterministic label colormap (the PASCAL-VOC bit-shuffle palette
    the reference gets from imgviz). [n, 3] uint8."""

    def bitget(byteval, idx):
        return (byteval >> idx) & 1

    cmap = np.zeros((n_labels, 3), np.uint8)
    for i in range(n_labels):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = [r, g, b]
    return cmap


def vis_semantic_label(semantics: np.ndarray, colormap: np.ndarray | None = None) -> np.ndarray:
    """[H, W, S] logits/probabilities -> [H, W, 3] uint8 color map
    (ref: sem_utils.py:16-26; channels-last here)."""
    labels = np.argmax(np.asarray(semantics), axis=-1)
    cmap = colormap if colormap is not None else label_colormap(semantics.shape[-1] + 1)
    return cmap[labels].astype(np.uint8)


def vis_semantic_gt(semantic_gt: np.ndarray, colormap: np.ndarray | None = None) -> np.ndarray:
    """[H, W] int labels (negative = invalid) -> [H, W, 3] uint8
    (ref: sem_utils.py:29-40)."""
    gt = np.asarray(semantic_gt)
    cmap = colormap if colormap is not None else label_colormap(int(gt.max()) + 2)
    out = np.zeros((*gt.shape, 3), np.uint8)
    valid = gt >= 0
    out[valid] = cmap[gt[valid]]
    return out


# ---------------------------------------------------------------------------
# vector quantization (ref: vq_utils.py — straight-through estimator)
# ---------------------------------------------------------------------------


def vq(inputs: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Nearest codebook indices. inputs [..., D], codebook [K, D] -> [...]."""
    flat = inputs.reshape(-1, inputs.shape[-1])
    d = (
        jnp.sum(codebook ** 2, axis=1)[None, :]
        + jnp.sum(flat ** 2, axis=1, keepdims=True)
        - 2.0 * flat @ codebook.T
    )
    return jnp.argmin(d, axis=1).reshape(inputs.shape[:-1])


@jax.custom_vjp
def vq_straight_through(inputs: jnp.ndarray, codebook: jnp.ndarray):
    """Quantize with a straight-through gradient to the inputs and
    codebook rows (ref: vq_utils.py:33-65)."""
    idx = vq(inputs, codebook)
    codes = jnp.take(codebook, idx.reshape(-1), axis=0).reshape(inputs.shape)
    return codes, idx


def _vq_fwd(inputs, codebook):
    idx = vq(inputs, codebook)
    codes = jnp.take(codebook, idx.reshape(-1), axis=0).reshape(inputs.shape)
    return (codes, idx), (idx, codebook.shape[0])


def _vq_bwd(res, g):
    g_codes, _g_idx = g
    idx, K = res
    # straight-through: grads pass to inputs unchanged; codebook rows
    # accumulate the gradients of their selected codes
    g_flat = g_codes.reshape(-1, g_codes.shape[-1])
    g_codebook = jax.ops.segment_sum(g_flat, idx.reshape(-1), num_segments=K)
    return g_codes, g_codebook


vq_straight_through.defvjp(_vq_fwd, _vq_bwd)
