"""Segment-rowsum tuning probe at the sky-backward shape (TPU).

HARNESS CAVEAT: eager-chained timing through the axon tunnel is only
trustworthy for coarse (>5 ms) stages; for fine-grained op timing use an
in-jit lax.fori_loop chain (see docs/perf_journal.md measurement note).

Usage: python script/probe_segsum.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.ops import segsum as segsum_lib


def timed(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = fn_j(jnp.zeros(()), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(jnp.zeros(()), *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    R = 1024
    T = 6 * R * R
    H, W = 1064, 1600
    P = H * W
    rng = np.random.default_rng(0)
    # realistic keys: camera cone touches ~1.5 faces, spatially coherent
    face = rng.integers(0, 2, P)
    y = rng.integers(0, R - 1, P)
    x = rng.integers(0, R - 1, P)
    base = (face * R * R + y * R + x).astype(np.int32)
    C = 12
    vals = rng.random((P, C), np.float32)

    for cap, group in [(512, 1024), (512, 512), (1024, 1024), (256, 1024),
                       (512, 2048), (1024, 2048), (2048, 2048)]:
        L = (P + cap - 1) // cap * cap
        keys = np.pad(base, (0, L - P), constant_values=(1 << 30))
        v = np.pad(vals, ((0, L - P), (0, 0)))
        order = np.argsort(keys, kind="stable")
        skeys = jnp.asarray(keys[order])
        svals = jnp.asarray(v[order].T.copy())  # [C, L]
        Tp = (T + group - 1) // group * group
        texel = jnp.arange(Tp, dtype=jnp.int32)

        def run(t, svals, skeys, texel, cap=cap, group=group):
            return segsum_lib.segment_rowsum(
                svals + t, skeys, texel, texel + 1, cap=cap, group=group,
                skip_empty=True,
            )

        timed(f"segsum cap={cap} group={group} skip", run, svals, skeys, texel)


if __name__ == "__main__":
    main()
