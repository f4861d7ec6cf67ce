"""Micro-benchmark: candidate formulations for the payload-gather VJP
(the per-gaussian gradient reduction that replaces the CUDA backward's
atomicAdd, ref: cuda_rasterizer/backward.cu:568-638).

Round-1 measured the plain gather's scatter-add transpose at ~225 ms
and a [S,16] row cumsum variant at ~372 ms (lane-limited). This probe
measures every piece of the proposed all-gather backward:
  d_pre = d_out[src_slot]           (row gather, full lanes)
  cs    = cumsum(d_pre, axis=0)     (channel-major or multi-level)
  seg   = cs[end] - cs[begin-1]     (boundary row gathers)
  d_src = seg[rank_of_gauss]        (row gather)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 655360          # gaussians
C = 16              # payload channels (c_pad)
S = 2 ** 21         # pre-sort instance capacity
NT = 6700           # tiles at 1600x1064
S_pad = S + 128 * NT

rng = np.random.default_rng(0)


def timeit(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:55s} {dt:8.2f} ms")
    return dt


def main():
    # realistic instance->gaussian map: ~3.2 instances per gaussian on
    # average, contiguous ranges in pre-sort order
    cnt = rng.integers(1, 6, size=N).astype(np.int32)
    offs = np.cumsum(cnt) - cnt
    total = int(offs[-1] + cnt[-1])
    assert total < S, total
    inst_gauss_pre = np.repeat(np.arange(N, dtype=np.int32), cnt)
    inst_gauss_pre = np.pad(inst_gauss_pre, (0, S - total), constant_values=-1)
    # random permutation pre->packed slot (models the tile sort)
    perm = rng.permutation(S_pad)[:S].astype(np.int32)
    src_slot = np.where(inst_gauss_pre >= 0, perm, S_pad).astype(np.int32)
    inst_gauss_post = np.full(S_pad + 1, -1, np.int32)
    inst_gauss_post[src_slot] = inst_gauss_pre
    inst_gauss_post = inst_gauss_post[:S_pad]

    d_out = jnp.asarray(rng.standard_normal((S_pad, C)), jnp.float32)
    src_slot_j = jnp.asarray(src_slot)
    ig_post = jnp.asarray(inst_gauss_post)
    offs_j = jnp.asarray(offs.astype(np.int32))
    cnt_j = jnp.asarray(cnt)
    rank_of = jnp.asarray(rng.permutation(N).astype(np.int32))

    # ---- baseline: scatter-add (what the plain gather VJP emits) ----
    def scatter_add(d_out):
        safe = jnp.maximum(ig_post, 0)
        contrib = jnp.where((ig_post >= 0)[:, None], d_out, 0.0)
        return jnp.zeros((N, C), jnp.float32).at[safe].add(contrib)

    timeit("scatter-add baseline", scatter_add, d_out, iters=3)

    # ---- piece 1: row gather S rows from [S_pad+1, C] ----
    def gather_pre(d_out):
        d_pad = jnp.concatenate([d_out, jnp.zeros((1, C), jnp.float32)])
        return jnp.take(d_pad, src_slot_j, axis=0)

    timeit("row gather to pre-sort order", gather_pre, d_out)
    d_pre = jax.jit(gather_pre)(d_out)

    # ---- piece 2: cumsum variants over [S, C] axis 0 ----
    timeit("cumsum [S,16] axis0 (lane-limited)", lambda x: jnp.cumsum(x, axis=0), d_pre, iters=5)
    timeit("cumsum [16,S] axis1 (channel-major)",
           lambda x: jnp.cumsum(x.T, axis=1), d_pre, iters=5)

    def multilevel(x):
        # [S, C] -> [C, S] -> blocks of 512 over minor axis
        xt = x.T
        B = 512
        nb = S // B
        xb = xt.reshape(C, nb, B)
        inner = jnp.cumsum(xb, axis=2)
        blk = inner[:, :, -1]
        blk_cs = jnp.cumsum(blk, axis=1)
        excl = jnp.concatenate([jnp.zeros((C, 1), x.dtype), blk_cs[:, :-1]], axis=1)
        return inner + excl[:, :, None]

    timeit("cumsum multi-level (T + 512-blocks)", multilevel, d_pre, iters=5)

    def multilevel_rowmajor(x):
        # keep [S, C]; reshape to [S//8, 8*C] = [S//8, 128] full-lane rows
        y = x.reshape(S // 8, 8 * C)
        B = 512
        nb = (S // 8) // B
        yb = y.reshape(nb, B, 8 * C)
        inner = jnp.cumsum(yb, axis=1)            # within 512-row blocks
        blk = inner[:, -1, :]                     # [nb, 128]
        blk_cs = jnp.cumsum(blk, axis=0)
        excl = jnp.concatenate([jnp.zeros((1, 8 * C), x.dtype), blk_cs[:-1]], axis=0)
        z = inner + excl[:, None, :]              # rows cumsum'd, but the
        # 8 sub-rows inside each 128-lane row still need an intra-row prefix
        z = z.reshape(S // 8, 8, C)
        z = jnp.cumsum(z, axis=1)                 # tiny axis of 8
        return z.reshape(S, C)

    timeit("cumsum row-major [S//8,128] two-level", multilevel_rowmajor, d_pre, iters=5)

    # ---- piece 3: boundary gathers + final unpermute ----
    cs = jax.jit(lambda x: jnp.cumsum(x.T, axis=1))(d_pre)  # [C, S]

    def boundaries(cs):
        end = jnp.clip(offs_j + cnt_j - 1, 0, S - 1)
        lo_i = jnp.clip(offs_j - 1, 0, S - 1)
        hi = jnp.take(cs, end, axis=1)
        lo = jnp.where((offs_j > 0)[None, :], jnp.take(cs, lo_i, axis=1), 0.0)
        seg = jnp.where((cnt_j > 0)[None, :], hi - lo, 0.0)  # [C, N]
        return jnp.take(seg, rank_of, axis=1).T  # [N, C]

    timeit("boundary gathers + unpermute (channel-major)", boundaries, cs)

    cs_row = jax.jit(lambda x: multilevel_rowmajor(x))(d_pre)

    def boundaries_row(cs):
        end = jnp.clip(offs_j + cnt_j - 1, 0, S - 1)
        lo_i = jnp.clip(offs_j - 1, 0, S - 1)
        hi = jnp.take(cs, end, axis=0)
        lo = jnp.where((offs_j > 0)[:, None], jnp.take(cs, lo_i, axis=0), 0.0)
        seg = jnp.where((cnt_j > 0)[:, None], hi - lo, 0.0)  # [N, C]
        return jnp.take(seg, rank_of, axis=0)  # [N, C]

    timeit("boundary gathers + unpermute (row-major)", boundaries_row, cs_row)

    # ---- piece 4 (forward-side cost): building src_slot by scatter ----
    ss_sorted = jnp.asarray(rng.permutation(S).astype(np.int32))  # stand-in
    dest = jnp.asarray(rng.permutation(S_pad)[:S].astype(np.int32))

    def build_srcslot(ss, dest):
        return jnp.full((S,), S_pad, jnp.int32).at[ss].set(dest, mode="drop")

    timeit("build src_slot: int32 scatter-set [S]", build_srcslot, ss_sorted, dest)

    def build_srcslot_sort(ss, dest):
        a, b = jax.lax.sort((ss, dest), num_keys=1, is_stable=False)
        return b

    timeit("build src_slot: 2-key sort [S]", build_srcslot_sort, ss_sorted, dest)

    # ---- end-to-end structured backward (best pieces) ----
    def structured(d_out):
        d_pad = jnp.concatenate([d_out, jnp.zeros((1, C), jnp.float32)])
        d_pre = jnp.take(d_pad, src_slot_j, axis=0)
        cs = multilevel_rowmajor(d_pre)
        return boundaries_row(cs)

    timeit("END-TO-END structured backward", structured, d_out, iters=10)

    # parity vs scatter-add
    a = jax.jit(scatter_add)(d_out)
    b = jax.jit(structured)(d_out)
    print("max abs diff vs scatter-add:", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
