"""Probe: what do big row gathers actually cost on this chip, and does
fusing them with elementwise ops scalarize them (perf journal lesson 1)?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
S = 2 ** 21
NT = 6700
S_pad = S + 128 * NT
N = 655360
C = 16


def timeit(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:58s} {dt:8.2f} ms")
    return dt


big = jnp.asarray(rng.standard_normal((S_pad + 1, C)), jnp.float32)
idx_rand = jnp.asarray(rng.integers(0, S_pad, size=S).astype(np.int32))
idx_sorted = jnp.sort(idx_rand)
small_src = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
idx_into_small = jnp.asarray(rng.integers(0, N, size=S_pad).astype(np.int32))

# bare gathers
timeit("take [S] rand rows from [2.95M,16]", lambda s, i: jnp.take(s, i, axis=0), big, idx_rand)
timeit("take [S] SORTED rows from [2.95M,16]", lambda s, i: jnp.take(s, i, axis=0), big, idx_sorted)
timeit("take [S_pad] rows from [N,16] (fwd-like)", lambda s, i: jnp.take(s, i, axis=0), small_src, idx_into_small)

# gather + elementwise (fusion test)
timeit("take+where (fused elementwise)",
       lambda s, i: jnp.where((i < S)[:, None], jnp.take(s, i, axis=0), 0.0),
       big, idx_rand)

# gather with barrier isolation
def barriered(s, i):
    g = jnp.take(s, i, axis=0)
    g = jax.lax.optimization_barrier(g)
    return jnp.where((i < S)[:, None], g, 0.0)
timeit("barrier(take)+where", barriered, big, idx_rand)

# N-row boundary gather (sorted, dense coverage)
offs = np.sort(rng.choice(S, size=N, replace=False)).astype(np.int32)
offs_j = jnp.asarray(offs)
cs = jnp.asarray(rng.standard_normal((S, C)), jnp.float32)
timeit("take [N] sorted boundary rows from [2M,16]",
       lambda s, i: jnp.take(s, i, axis=0), cs, offs_j)

# same but gathering 128-wide rows (pad C to 128): full-lane rows
big128 = jnp.asarray(rng.standard_normal((S // 4, 128)), jnp.float32)
idx4 = jnp.asarray(rng.integers(0, S // 4, size=S // 4).astype(np.int32))
timeit("take [S/4] rows from [S/4,128] (512B rows)",
       lambda s, i: jnp.take(s, i, axis=0), big128, idx4)

# dynamic_slice style single big contiguous read for reference bandwidth
timeit("copy 189MB (bandwidth ref)", lambda s: s * 1.000001, big, iters=20)
