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
A group of consecutive gaussians then covers a contiguous row range
of the sorted array, so its `group` segment sums are one banded
0/1-matrix product:  out[C, group] = block[C, cap] @ A[group, cap]^T,
with A[r, s] = (offs[r] <= key[s] < ends[r]) built from iota/compares
on the VPU and the product running on the MXU. The grid walks
(group, chunk) pairs flattened into one sequential axis, accumulating
chunk partials into the group's output block (Pallas keeps a revisited
output block in VMEM between steps).

Output is CHANNEL-MAJOR [C, N]. The [N, C] orientation with small C is
a trap: TPU HBM layouts tile the two minormost dims to (8, 128), so a
[N, 12] f32 buffer physically occupies N*128*4 B — 3.2 GB for the sky
backward's 6.3M-texel space — and the kernel's output writes plus the
skip_empty zero-init each paid ~16 ms of pure padding traffic
(measured; the whole reduction was 33 ms). As [C, Gp, group] the buffer
is N*C*4 B up to a C->8k sublane pad (33% at C=12, vs 10x+ lane pad).

Segments are usually SINGLETONS over an identity space (segment g owns
key g): pass offs=None and the kernel builds A from one iota compare,
skipping the offs/ends operands entirely. Pass explicit offs/ends for
general contiguous segments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # default segments per output block
BIG = jnp.int32(1 << 30)  # key value for padding rows (falls in no segment)


def pack_bf16_pair(a, b):
    """Two f32 arrays -> one u32 array of bf16 halves (a high, b low).
    Round-trips through `unpack_bf16_pair` as exactly
    `astype(bf16).astype(f32)` of each input — the same rounding the
    segment-sum matmul applies to every addend at default TPU
    precision, so sorting packed words instead of f32 channels is
    bit-neutral for reductions that feed `segment_rowsum`."""
    ua = jax.lax.bitcast_convert_type(a.astype(jnp.bfloat16), jnp.uint16)
    ub = jax.lax.bitcast_convert_type(b.astype(jnp.bfloat16), jnp.uint16)
    return (ua.astype(jnp.uint32) << 16) | ub.astype(jnp.uint32)


def unpack_bf16_pair(w):
    """Inverse of `pack_bf16_pair`: u32 array -> (a, b) f32 arrays."""
    hi = jax.lax.bitcast_convert_type(
        (w >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        (w & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return hi, lo


def _kernel(
    group_of_step,
    block_of_step,
    first_of_step,
    valid_of_step,
    keys_ref,
    d_ref,
    *rest,
    cap,
    group,
    identity,
    precision,
):
    out_ref = rest[-1]
    s = pl.program_id(0)
    first = first_of_step[s]
    valid = valid_of_step[s]

    # tail (valid=0) steps skip compute AND writes entirely: they revisit
    # an already-written block, so leaving VMEM untouched is correct, and
    # predicating the matmul makes over-provisioned MAXC steps ~free
    # (first-order when skip_empty leaves most steps as tail).
    @pl.when(valid > 0)
    def _():
        k = keys_ref[0, :]  # [cap] int32
        r = jax.lax.broadcasted_iota(jnp.int32, (group, cap), 0)
        if identity:
            # segment r of this group owns exactly key group_id*group + r
            A = k[None, :] - group_of_step[s] * group == r
        else:
            offs_ref, ends_ref = rest[0], rest[1]
            # offs/ends blocks hold 8 groups (TPU sublane tiling)
            row = group_of_step[s] % 8
            sel = jax.lax.broadcasted_iota(jnp.int32, (8, group), 0) == row
            o = jnp.sum(jnp.where(sel, offs_ref[...], 0), axis=0)  # [group]
            e = jnp.sum(jnp.where(sel, ends_ref[...], 0), axis=0)  # [group]
            A = (k[None, :] >= o[:, None]) & (k[None, :] < e[:, None])
        Af = A.astype(jnp.float32)  # [group, cap]
        blk = d_ref[...]  # [C, cap]
        partial = jax.lax.dot_general(
            blk,
            Af,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [C, group]

        @pl.when(first > 0)
        def _():
            out_ref[...] = partial

        @pl.when(first == 0)
        def _():
            out_ref[...] = out_ref[...] + partial


def segment_rowsum(
    d_chan: jnp.ndarray,
    keys: jnp.ndarray,
    offs: jnp.ndarray | None = None,
    ends: jnp.ndarray | None = None,
    *,
    num_segments: int | None = None,
    cap: int = 1024,
    group: int = GROUP,
    skip_empty: bool = False,
    precision=None,
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
      of `group` (pad with offs=ends). Pass offs=None (with
      num_segments=N) for the common IDENTITY case — segment g owns
      exactly key g — which skips the offs/ends operands and builds the
      0/1 matrix from a single iota compare.
    group: segments per output block — raise it (e.g. 512) when N is
      large and segments are tiny, to amortize per-grid-step overhead.
    skip_empty: give groups with ZERO entries no grid step at all; their
      output blocks come from a zero-initialized aliased buffer instead.
      Pays one [C, N] memset; wins when the keys cover a small or
      clustered part of the segment space (the sky cubemap backward: a
      camera cone touches <2 of 6 faces, so >60% of texel groups are
      empty). Bit-identical to the dense walk.
    precision: matmul precision for the banded reduction. At the TPU
      default (None), the MXU rounds each ADDEND to bf16 before the f32
      accumulation (A is 0/1, exact in bf16, so the result is bit-equal
      to summing bf16-rounded rows in f32 — verified vs oracle). This is
      the deliberate fast path: gradient addends at ~4e-3 relative
      rounding are far below inter-step sampling noise (demo-scene
      convergence is unaffected). Pass jax.lax.Precision.HIGHEST for
      ~f32-exact sums at 3x the MXU passes.
    Returns [C, N] f32 (channel-major — see module docstring for why).
    """
    C, L = d_chan.shape
    identity = offs is None
    if identity:
        assert num_segments is not None
        N = num_segments
    else:
        N = offs.shape[0]
    assert L % cap == 0 and N % group == 0 and group % 8 == 0, (L, cap, N, group)
    G = N // group
    num_blocks = L // cap
    # static upper bound on (group, chunk) steps: every group has >= 1
    # chunk, and each extra chunk consumes a distinct block boundary
    MAXC = G + num_blocks + 1

    # ---- per-group block ranges in the sorted key array ----
    if identity:
        lo = jnp.arange(G, dtype=jnp.int32) * group
        hi = lo + group
    else:
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
    if skip_empty:
        nchunks = jnp.where(row1 > row0, nchunks, 0)

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
    # tail steps: no compute, no writes. Without skip_empty they revisit
    # the last group's block (always already written); with skip_empty
    # they must NOT target a possibly-never-written block (its VMEM
    # buffer would be copied back as garbage over the aliased zeros), so
    # they park on a trash output block G.
    tail_group = G if skip_empty else G - 1
    block_of_step = jnp.where(
        valid_of_step > 0, jnp.clip(block_of_step, 0, num_blocks - 1), b1[-1]
    )
    group_of_step = jnp.where(valid_of_step > 0, group_of_step, tail_group)

    in_specs = [
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
    ]
    # with skip_empty the group axis gains a trash block G for tail steps
    Gp = G + 1 if skip_empty else G
    inputs = [
        group_of_step,
        block_of_step,
        first_of_step,
        valid_of_step,
        keys[None, :],
        d_chan,
    ]
    num_operands = 2
    if not identity:
        pad8 = (-Gp) % 8 + (Gp - G)
        for arr in (og, eg):
            in_specs.append(
                pl.BlockSpec(
                    (8, group),
                    lambda s, g_, b_, f_, v_: (g_[s] // 8, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            # pad the group axis to the (8, 128) int32 tile height; padding
            # rows are never selected (valid steps keep group_of_step < G)
            inputs.append(jnp.pad(arr, ((0, pad8), (0, 0)), constant_values=BIG))
            num_operands += 1
    aliases = {}
    if skip_empty:
        # zero-initialized buffer aliased to the output: groups with no
        # entries get no grid step, so their blocks must pre-exist.
        # (alias indices count the scalar-prefetch operands)
        in_specs.append(
            pl.BlockSpec(
                (C, group),
                lambda s, g_, b_, f_, v_: (0, g_[s]),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(jnp.zeros((C, Gp * group), jnp.float32))
        aliases = {4 + num_operands: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(MAXC,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (C, group),
            lambda s, g_, b_, f_, v_: (0, g_[s]),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, cap=cap, group=group, identity=identity, precision=precision
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, Gp * group), jnp.float32),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*inputs)
    return out[:, :N]
