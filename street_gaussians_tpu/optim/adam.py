"""Row-masked Adam over a parameter pytree.

TPU-native replacement for the reference's per-sub-model torch Adam
(eps 1e-15, ref: lib/models/gaussian_model.py:295-305): instead of one
optimizer per sub-model with state surgery on cat/prune, there is a
single pytree of packed fixed-capacity parameters, and densification
rewrites the moment arrays with the same masked scatters it applies to
the parameters.

Per-row semantics replicate torch Adam under `zero_grad(set_to_none=True)`:
a parameter that receives no gradient this step is skipped entirely
(moments not decayed, step count not incremented). Here that is expressed
by a per-row `mask` (rows = Gaussians alive AND belonging to a model
visible at this frame); the per-row step count also reproduces torch's
per-tensor `step` for actors that enter the scene late.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any  # first moments, same structure as params
    nu: Any  # second moments
    count: Any  # per-leaf step counts: [rows] for masked leaves, scalar otherwise


def adam_init(params, row_counts: Optional[Any] = None) -> AdamState:
    """row_counts: optional pytree (same structure, None leaves allowed)
    where a True entry means the leaf gets a per-row [N] step counter."""
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    if row_counts is None:
        count = jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params)
    else:
        count = jax.tree.map(
            lambda p, rc: jnp.zeros((p.shape[0],) if rc else (), jnp.float32),
            params,
            row_counts,
        )
    return AdamState(mu=mu, nu=nu, count=count)


def _broadcast_rows(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Reshape a per-row [N] array to broadcast against target [N, ...]."""
    return x.reshape(x.shape + (1,) * (target.ndim - x.ndim))


def _leaf_update(p, g, mu, nu, cnt, lr, mask, b1, b2, eps):
    if mask is None:
        m = jnp.ones((), p.dtype)
    else:
        m = mask.astype(p.dtype)
    mb = _broadcast_rows(m, p) if m.ndim else m
    cnt = cnt + m
    mu = mb * (b1 * mu + (1.0 - b1) * g) + (1.0 - mb) * mu
    nu = mb * (b2 * nu + (1.0 - b2) * g * g) + (1.0 - mb) * nu
    c = _broadcast_rows(cnt, p) if cnt.ndim else cnt
    stepped = c > 0.0
    bc1 = 1.0 - b1 ** jnp.where(stepped, c, 1.0)
    bc2 = 1.0 - b2 ** jnp.where(stepped, c, 1.0)
    mhat = mu / bc1
    vhat = nu / bc2
    if isinstance(lr, jnp.ndarray) and lr.ndim:
        lr = _broadcast_rows(lr, p)
    upd = jnp.where(stepped, lr * mhat / (jnp.sqrt(vhat) + eps), 0.0)
    return p - mb * upd, mu, nu, cnt


def adam_update(
    params,
    grads,
    state: AdamState,
    lr,
    mask=None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step.

    lr: pytree of scalars (or per-row [N] arrays, e.g. the xyz learning
        rate scaled per-model) matching params' structure.
    mask: optional pytree (None leaves = always active) of per-row [N]
        activity masks.

    Returns (new_params, new_state).
    """
    treedef = jax.tree.structure(params)
    p_l = jax.tree.leaves(params)
    g_l = jax.tree.leaves(grads)
    mu_l = jax.tree.leaves(state.mu)
    nu_l = jax.tree.leaves(state.nu)
    c_l = jax.tree.leaves(state.count)
    lr_l = jax.tree.leaves(lr) if jax.tree.structure(lr) == treedef else [lr] * len(p_l)
    if mask is None:
        m_l = [None] * len(p_l)
    else:
        # mask leaves: [N] row masks or scalar 1.0 for always-active leaves
        m_l = jax.tree.leaves(mask)

    new_p, new_mu, new_nu, new_c = [], [], [], []
    for p, g, mu, nu, c, lr_i, m in zip(p_l, g_l, mu_l, nu_l, c_l, lr_l, m_l):
        np_, nmu, nnu, nc = _leaf_update(p, g, mu, nu, c, lr_i, m, b1, b2, eps)
        new_p.append(np_)
        new_mu.append(nmu)
        new_nu.append(nnu)
        new_c.append(nc)

    return (
        jax.tree.unflatten(treedef, new_p),
        AdamState(
            mu=jax.tree.unflatten(treedef, new_mu),
            nu=jax.tree.unflatten(treedef, new_nu),
            count=jax.tree.unflatten(treedef, new_c),
        ),
    )
