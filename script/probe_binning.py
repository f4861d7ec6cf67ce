"""Binning stage dissection at bench scale (TPU).

Usage: python script/probe_binning.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    t = jnp.zeros(())
    out = fn_j(t, *args)
    t = jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0.0
    float(t)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(t, *args)
        t = jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0.0
    float(t)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    N = 663552  # bench gaussian capacity
    S = 1 << 21
    rng = np.random.default_rng(0)
    pos = np.sort(rng.integers(0, S, N)).astype(np.int32)
    col = rng.integers(0, 1 << 21, N).astype(np.int32)
    posj = jnp.asarray(pos)
    colj = jnp.asarray(col)

    def scat(t, pos, col):
        prev = jnp.concatenate([jnp.zeros((1,), col.dtype), col[:-1]])
        buf = jnp.zeros((S,), jnp.int32).at[pos].add(col - prev + t.astype(jnp.int32), mode="drop")
        return buf

    timed("1 delta-scatter 660k -> 2M", scat, posj, colj)

    def scat_cumsum(t, pos, col):
        return jnp.cumsum(scat(t, pos, col))

    timed("1 delta-scatter + cumsum", scat_cumsum, posj, colj)

    def four(t, pos, col):
        return [jnp.cumsum(scat(t, pos, col + i)) for i in range(4)]

    timed("4 delta-scatter + cumsum", four, posj, colj)

    keys = jnp.asarray(rng.integers(0, 1 << 21, S).astype(np.int32))
    v1 = jnp.asarray(rng.integers(0, 1 << 21, S).astype(np.int32))
    v2 = jnp.asarray(rng.integers(0, 1 << 21, S).astype(np.int32))

    def sort3(t, keys, v1, v2):
        return jax.lax.sort((keys + t.astype(jnp.int32), v1, v2), num_keys=1, is_stable=True)

    timed("stable sort 2M x (key + 2 vals)", sort3, keys, v1, v2)

    def sort2(t, keys, v1):
        return jax.lax.sort((keys + t.astype(jnp.int32), v1), num_keys=1, is_stable=True)

    timed("stable sort 2M x (key + 1 val)", sort2, keys, v1)

    S2 = 1536 * 1024
    timed("stable sort 1.5M x (key + 1 val)", sort2, keys[:S2], v1[:S2])

    def gather_n(t, col):
        idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
        return jnp.take(col + t.astype(jnp.int32), idx)

    timed("gather 660k x 1ch", gather_n, colj)

    # full binning for reference
    from street_gaussians_tpu.ops import binning, preprocess
    from street_gaussians_tpu.data.synthetic import make_synthetic_scene
    print("(full binning measured in profile_step.py: ~46 ms)")


if __name__ == "__main__":
    main()
