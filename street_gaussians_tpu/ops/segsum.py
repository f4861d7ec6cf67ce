"""Segmented row-sum on the MXU: the deterministic, scatter-free
per-gaussian gradient reduction.

This is the TPU-native replacement for the CUDA backward's atomicAdd
accumulation of per-instance gradients into per-Gaussian slots
(ref: cuda_rasterizer/backward.cu:568-638). The JAX-level alternative
(`.at[idx].add`) lowers to an XLA scatter that runs at ~80 ns/row on
TPU (measured: 238 ms for 2.95 M rows); this kernel does the same
reduction in a few ms.

Key idea: after the payload-gradient rows are sorted by their pre-sort
instance position (a radix `lax.sort`, bandwidth-bound), every
gaussian's instances occupy a contiguous key range [offs[g], ends[g]).
A group of 128 consecutive gaussians then covers a contiguous row range
of the sorted array, so its 128 segment sums are one banded 0/1-matrix
product:  out[128, C] = A[128, cap] @ block[cap, C],  with
A[r, s] = (offs[r] <= key[s] < ends[r]) built from iota/compares on the
VPU and the product running on the MXU. The grid walks (group, chunk)
pairs flattened into one sequential axis, accumulating chunk partials
into the group's output block (Pallas keeps a revisited output block in
VMEM between steps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # default segments per output block
BIG = jnp.int32(1 << 30)  # key value for padding rows (falls in no segment)


def _kernel(
    group_of_step,
    block_of_step,
    first_of_step,
    valid_of_step,
    keys_ref,
    d_ref,
    offs_ref,
    ends_ref,
    out_ref,
    *,
    cap,
):
    s = pl.program_id(0)
    first = first_of_step[s]
    valid = valid_of_step[s]

    k = keys_ref[0, :]  # [cap] int32
    # offs/ends blocks hold 8 groups (TPU sublane tiling); select ours
    group = offs_ref.shape[1]
    row = group_of_step[s] % 8
    sel = jax.lax.broadcasted_iota(jnp.int32, (8, group), 0) == row
    o = jnp.sum(jnp.where(sel, offs_ref[...], 0), axis=0)  # [group]
    e = jnp.sum(jnp.where(sel, ends_ref[...], 0), axis=0)  # [group]
    A = (k[None, :] >= o[:, None]) & (k[None, :] < e[:, None])  # [group, cap]
    Af = jnp.where(valid > 0, A.astype(jnp.float32), 0.0)
    blk = d_ref[...]  # [C, cap]
    partial = jax.lax.dot_general(
        Af,
        blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [GROUP, C]

    @pl.when(first > 0)
    def _():
        out_ref[0] = partial

    @pl.when(first == 0)
    def _():
        out_ref[0] = out_ref[0] + partial


def segment_rowsum(
    d_chan: jnp.ndarray,
    keys: jnp.ndarray,
    offs: jnp.ndarray,
    ends: jnp.ndarray,
    *,
    cap: int = 1024,
    group: int = GROUP,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sum rows of `d_chan` into per-segment totals.

    d_chan: [C, L] f32 — instance rows (channel-major), ordered so that
      row j has key `keys[j]` with keys ascending. L must be a multiple
      of `cap`.
    keys: [L] int32 ascending; padding rows carry key >= BIG.
    offs/ends: [N] int32 — segment g owns keys in [offs[g], ends[g]).
      offs must be non-decreasing and segments non-overlapping (the
      instance-enumeration order guarantees both). N must be a multiple
      of `group` (pad with offs=ends).
    group: segments per output block — raise it (e.g. 512) when N is
      large and segments are tiny, to amortize per-grid-step overhead.
    Returns [N, C] f32.
    """
    C, L = d_chan.shape
    N = offs.shape[0]
    assert L % cap == 0 and N % group == 0 and group % 8 == 0, (L, cap, N, group)
    G = N // group
    num_blocks = L // cap
    # static upper bound on (group, chunk) steps: every group has >= 1
    # chunk, and each extra chunk consumes a distinct block boundary
    MAXC = G + num_blocks + 1

    # ---- per-group block ranges in the sorted key array ----
    og = offs.reshape(G, group)
    eg = ends.reshape(G, group)
    lo = og[:, 0]
    hi = jnp.max(eg, axis=1)
    row0 = jnp.searchsorted(keys, lo, side="left").astype(jnp.int32)
    row1 = jnp.searchsorted(keys, hi, side="left").astype(jnp.int32)  # exclusive
    b0 = jnp.clip(row0 // cap, 0, num_blocks - 1)
    b1 = jnp.clip((jnp.maximum(row1, row0 + 1) - 1) // cap, 0, num_blocks - 1)
    b1 = jnp.maximum(b0, b1)
    nchunks = b1 - b0 + 1  # >= 1 always

    # ---- flatten (group, chunk) into one sequential step axis via the
    # delta-scatter + cumsum expansion (no gathers) ----
    starts = jnp.cumsum(nchunks) - nchunks  # [G] exclusive
    total = starts[-1] + nchunks[-1]
    step = jnp.arange(MAXC, dtype=jnp.int32)

    def expand(vals):
        prev = jnp.concatenate([jnp.zeros((1,), vals.dtype), vals[:-1]])
        buf = jnp.zeros((MAXC,), vals.dtype).at[starts].add(vals - prev, mode="drop")
        return jnp.cumsum(buf)

    group_of_step = expand(jnp.arange(G, dtype=jnp.int32))
    b0_of_step = expand(b0)
    start_of_step = expand(starts)
    block_of_step = b0_of_step + (step - start_of_step)
    first_of_step = (step == start_of_step).astype(jnp.int32)
    valid_of_step = (step < total).astype(jnp.int32)
    # tail steps: revisit the last group's block harmlessly (valid=0)
    block_of_step = jnp.where(
        valid_of_step > 0, jnp.clip(block_of_step, 0, num_blocks - 1), b1[-1]
    )
    group_of_step = jnp.where(valid_of_step > 0, group_of_step, G - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(MAXC,),
        in_specs=[
            pl.BlockSpec(
                (1, cap),
                lambda s, g_, b_, f_, v_: (0, b_[s]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, cap),
                lambda s, g_, b_, f_, v_: (0, b_[s]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, group),
                lambda s, g_, b_, f_, v_: (g_[s] // 8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, group),
                lambda s, g_, b_, f_, v_: (g_[s] // 8, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, group, C),
            lambda s, g_, b_, f_, v_: (g_[s], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cap=cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, group, C), jnp.float32),
        interpret=interpret,
    )(
        group_of_step,
        block_of_step,
        first_of_step,
        valid_of_step,
        keys[None, :],
        d_chan,
        # pad the group axis to the (8, 128) int32 tile height; padding
        # rows are never selected (group_of_step stays < G)
        jnp.pad(og, ((0, (-G) % 8, ), (0, 0)), constant_values=BIG),
        jnp.pad(eg, ((0, (-G) % 8, ), (0, 0)), constant_values=BIG),
    )
    return out.reshape(N, C)
