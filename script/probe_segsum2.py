"""Dissect segsum cost: grid overhead vs A-build vs matmul. (TPU)"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def noop_kernel(g_of, b_of, keys_ref, d_ref, out_ref):
    pass


def probe_grid(nsteps, nblocks, ngroups, cap, group, C, pattern, name):
    """Pure pipeline: fetch key+d blocks per step, write out block, no compute."""
    rng = np.random.default_rng(0)
    if pattern == "walk":
        b_of = np.minimum(np.arange(nsteps) % nblocks, nblocks - 1)
        g_of = np.minimum(np.arange(nsteps) // 2 % ngroups, ngroups - 1)
    else:
        b_of = rng.integers(0, nblocks, nsteps)
        g_of = rng.integers(0, ngroups, nsteps)
    keys = jnp.zeros((1, nblocks * cap), jnp.int32)
    d = jnp.zeros((C, nblocks * cap), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, cap), lambda s, g_, b_: (0, b_[s]), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, cap), lambda s, g_, b_: (0, b_[s]), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, C), lambda s, g_, b_: (g_[s], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        noop_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngroups, group, C), jnp.float32),
    )

    def run(t, g_of, b_of, keys, d):
        return f(g_of, b_of, keys, d + t)

    timed(name, run, jnp.asarray(g_of, jnp.int32), jnp.asarray(b_of, jnp.int32),
          keys, d)


def compute_kernel(g_of, b_of, keys_ref, d_ref, out_ref, *, cap, group, mode):
    s = pl.program_id(0)
    k = keys_ref[0, :]
    if mode == "identity":
        # A[r, s] = (k[s] - g*group == r): one subtract + one compare
        rel = k - g_of[s] * group
        A = jax.lax.broadcasted_iota(jnp.int32, (group, cap), 0) == rel[None, :]
        Af = A.astype(jnp.bfloat16)
        partial = jax.lax.dot_general(
            Af, d_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = partial
    elif mode == "abuild":
        rel = k - g_of[s] * group
        A = jax.lax.broadcasted_iota(jnp.int32, (group, cap), 0) == rel[None, :]
        out_ref[0] = jnp.sum(A.astype(jnp.float32), axis=1, keepdims=True) * jnp.ones(
            (1, out_ref.shape[2]), jnp.float32)


def probe_compute(nsteps, nblocks, ngroups, cap, group, C, mode, name):
    b_of = np.minimum(np.arange(nsteps) % nblocks, nblocks - 1)
    g_of = np.minimum(np.arange(nsteps) // 2 % ngroups, ngroups - 1)
    keys = jnp.zeros((1, nblocks * cap), jnp.int32)
    d = jnp.zeros((C, nblocks * cap), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, cap), lambda s, g_, b_: (0, b_[s]), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, cap), lambda s, g_, b_: (0, b_[s]), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, group, C), lambda s, g_, b_: (g_[s], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        functools.partial(compute_kernel, cap=cap, group=group, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngroups, group, C), jnp.float32),
    )

    def run(t, g_of, b_of, keys, d):
        return f(g_of, b_of, keys, d + t)

    timed(name, run, jnp.asarray(g_of, jnp.int32), jnp.asarray(b_of, jnp.int32),
          keys, d)


def main():
    pass


def main2():
    cap, group, C = 512, 1024, 12
    L = 1703936
    nblocks = L // cap
    probe_grid(2000, nblocks, 64, cap, group, C, "walk", "noop 2000 steps, ngroups=64 (3MB out)")
    probe_grid(2000, nblocks, 6150, cap, group, 128, "walk", "noop 2000 steps, C=128 (3.2GB out? no 128ch)")
    probe_grid(100, nblocks, 6150, cap, group, C, "walk", "noop 100 steps, ngroups=6150")
    probe_grid(100, 4, 64, cap, group, C, "walk", "noop 100 steps, tiny everything")
    probe_grid(2000, 4, 64, cap, group, C, "walk", "noop 2000 steps, tiny in/out")


# main2()



def main3():
    cap, group = 512, 1024
    L = 1703936
    nblocks = L // cap
    for nsteps in (100, 400, 2000):
        for ngroups in (512, 6150):
            for C in (12, 128):
                probe_grid(nsteps, nblocks, ngroups, cap, group, C, "walk",
                           f"noop steps={nsteps} ngroups={ngroups} C={C}")


main3()

