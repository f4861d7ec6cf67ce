"""Run-expansion ("fill-forward") on the MXU: gather-free, scatter-free.

Expands per-gaussian values to per-instance slots: gaussian j owns the
contiguous slot run [offs[j], offs[j+1]) (instances are enumerated in
depth order, binning.bin_gaussians_instances), so

    out[:, s] = vals[:, j]   for the unique j with offs[j] <= s < offs[j+1]

This replaces BOTH prior formulations, each measured against the TPU's
weak spots (docs/perf_journal.md):
  * per-channel delta-scatter + cumsum — the scatter engine serializes
    per position AND per operand array (~1.2 ms per 660k-position
    channel at bench scale), so multi-channel expansion scales linearly
    with channel count;
  * a per-instance row gather — descriptor-rate-bound at ~6.5 ns/row
    (9.7 ms for 1.5M x 64 B rows in the round-3 trace).

Here each output block of GOUT slots multiplies the band of candidate
runs on the MXU:  out[C, GOUT] = vals[C, CAP] @ A^T, with the 0/1
select matrix A[s, j] = (offs[j] <= s < offs[j+1]) built from two
iota compares on the VPU. Every slot column of A has AT MOST ONE
nonzero (runs partition the slot space), so at HIGHEST precision the
matmul is BIT-EXACT: the bf16x3 operand split reconstructs each f32
value exactly, and every accumulation step adds zeros to it.

The grid walks flattened (block, chunk) pairs exactly like
ops/segsum.py (the reduction dual of this expansion): per-block bands
come from two searchsorted calls on the host graph; blocks whose band
spans several CAP-chunks get one step per chunk, accumulating into the
same output block (disjoint nonzeros -> still exact).

Ref analog: none — the CUDA pipeline's duplicateWithKeys writes
instances with per-thread scatter stores (rasterizer_impl.cu:70-138);
this is the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e at bench scale (1.5M slots, 660k runs; probe sweep in
# docs/perf_journal.md round 4): smaller blocks win — the mask build
# (2 compares over [GOUT, CAP] per step) and the M=C-thin select
# matmul both scale with block area, and at these sizes the extra grid
# steps are cheaper than the larger per-step mask/matmul.
GOUT = 512  # slots per output block
CAP = 256  # candidate runs per step


def _kernel(
    block_of_step,
    chunk_of_step,
    first_of_step,
    valid_of_step,
    offs_ref,
    offs_next_ref,
    vals_ref,
    out_ref,
    *,
    precision,
):
    s = pl.program_id(0)
    b = block_of_step[s]

    # tail (valid=0) steps revisit the last real block: leave its VMEM
    # untouched (the copy-back flushes the already-correct content)
    @pl.when(valid_of_step[s] > 0)
    def _():
        o = offs_ref[0:1, :]  # [1, CAP] int32
        onx = offs_next_ref[0:1, :]  # [1, CAP]
        slot = b * GOUT + jax.lax.broadcasted_iota(jnp.int32, (GOUT, 1), 0)
        A = ((o <= slot) & (slot < onx)).astype(jnp.float32)  # [GOUT, CAP]
        partial = jax.lax.dot_general(
            vals_ref[...],  # [C, CAP]
            A,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [C, GOUT]

        @pl.when(first_of_step[s] > 0)
        def _():
            out_ref[...] = partial

        @pl.when(first_of_step[s] == 0)
        def _():
            out_ref[...] = out_ref[...] + partial


def expand_runs(
    vals: jnp.ndarray,
    offs: jnp.ndarray,
    total: jnp.ndarray,
    num_slots: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """vals: [C, N] f32 channel-major per-gaussian values (ints must be
    pre-converted to f32; exact below 2^24). offs: [N] int32
    non-decreasing run starts (exclusive cumsum of per-gaussian counts;
    zero-count gaussians share their successor's offset and produce
    empty runs). total: scalar int32 = offs[-1] + cnt[-1]. Returns
    [C, num_slots] f32; slots >= total (or covered by no run) are 0.
    """
    # run expansion is non-differentiable by design (binning ids / step
    # tables — the CUDA reference treats the sorted lists as constants
    # too); without this, shard_map's partial-eval materializes zero
    # tangents and hits pallas_call's missing JVP rule
    vals = jax.lax.stop_gradient(vals)
    offs = jax.lax.stop_gradient(offs)
    total = jax.lax.stop_gradient(total)
    C, N = vals.shape
    if N >= 2**24:
        # callers route integer channels (gaussian ids, step tables)
        # through this f32 matmul; f32 represents ints exactly only
        # below 2^24. Fail loudly instead of silently rounding ids on a
        # >=16.7M-gaussian scene (shard the gauss axis first).
        raise ValueError(
            f"expand_runs: {N} runs >= 2**24 — f32 select-matmul would "
            "round integer channels; shard the gaussian axis below 2^24 "
            "per device (parallel/gauss.py)"
        )
    if num_slots % GOUT:  # pad the slot space; caller sees [C, num_slots]
        return expand_runs(
            vals, offs, total, -(-num_slots // GOUT) * GOUT,
            interpret=interpret,
        )[:, :num_slots]
    S = num_slots
    B = S // GOUT
    Np = -(-N // CAP) * CAP
    NB = Np // CAP
    MAXC = B + NB + 1

    offs_next = jnp.concatenate([offs[1:], total.reshape(1)])
    # clamp to the slot space so padded/overflow runs select nothing
    offs_c = jnp.minimum(offs, S)
    offs_next_c = jnp.minimum(offs_next, S)
    pad = Np - N
    if pad:
        offs_c = jnp.pad(offs_c, (0, pad), constant_values=S)
        offs_next_c = jnp.pad(offs_next_c, (0, pad), constant_values=S)
        vals = jnp.pad(vals, ((0, 0), (0, pad)))

    # ---- per-block chunk ranges (band = runs intersecting the block):
    # g_lo = first j with offs_next[j] > lo, g_hi = first j with
    # offs[j] >= hi. Every block below `total` has a non-empty band
    # (runs partition [0, total)); empty bands still get one step whose
    # all-zero select writes the block's zeros. ----
    lo = jnp.arange(B, dtype=jnp.int32) * GOUT
    g_lo = jnp.searchsorted(offs_next_c, lo, side="right").astype(jnp.int32)
    g_hi = jnp.searchsorted(offs_c, lo + GOUT, side="left").astype(jnp.int32)
    c0 = jnp.clip(g_lo // CAP, 0, NB - 1)
    c1 = jnp.clip((jnp.maximum(g_hi, g_lo + 1) - 1) // CAP, 0, NB - 1)
    c1 = jnp.maximum(c0, c1)
    nchunks = c1 - c0 + 1  # >= 1

    # ---- flatten (block, chunk) -> steps (tiny B-position scatters) ----
    starts = jnp.cumsum(nchunks) - nchunks
    total_steps = starts[-1] + nchunks[-1]
    step = jnp.arange(MAXC, dtype=jnp.int32)

    def expand(v):
        prev = jnp.concatenate([jnp.zeros((1,), v.dtype), v[:-1]])
        buf = jnp.zeros((MAXC,), v.dtype).at[starts].add(v - prev, mode="drop")
        return jnp.cumsum(buf)

    block_of_step = expand(jnp.arange(B, dtype=jnp.int32))
    start_of_step = expand(starts)
    c0_of_step = expand(c0)
    chunk_of_step = c0_of_step + (step - start_of_step)
    first_of_step = (step == start_of_step).astype(jnp.int32)
    valid = step < total_steps
    chunk_of_step = jnp.where(valid, jnp.clip(chunk_of_step, 0, NB - 1), c1[-1])
    block_of_step = jnp.where(valid, block_of_step, B - 1)
    first_of_step = jnp.where(valid, first_of_step, 0)
    valid_of_step = valid.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(MAXC,),
        in_specs=[
            pl.BlockSpec(
                (1, CAP), lambda s, b_, c_, f_, v_: (0, c_[s]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, CAP), lambda s, b_, c_, f_, v_: (0, c_[s]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, CAP), lambda s, b_, c_, f_, v_: (0, c_[s]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (C, GOUT), lambda s, b_, c_, f_, v_: (0, b_[s]),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_kernel, precision=jax.lax.Precision.HIGHEST),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, S), jnp.float32),
        interpret=interpret,
    )(
        block_of_step,
        chunk_of_step,
        first_of_step,
        valid_of_step,
        offs_c[None, :],
        offs_next_c[None, :],
        vals,
    )
