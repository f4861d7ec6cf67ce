"""ops/fill.py expand_runs: the MXU banded select expansion must be
BIT-exact against the naive gather formulation for int-valued and
f32-valued channels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_tpu.ops.fill import expand_runs


def _naive(vals, offs, total, S):
    """out[:, s] = vals[:, j] iff offs[j] <= s < offs[j+1] (offs
    appended with total), else 0."""
    C, N = vals.shape
    offs = np.asarray(offs)
    ends = np.concatenate([offs[1:], [int(total)]])
    out = np.zeros((C, S), np.float32)
    for j in range(N):
        lo, hi = int(offs[j]), min(int(ends[j]), S)
        if hi > lo:
            out[:, lo:hi] = np.asarray(vals[:, j])[:, None]
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("S", [1024, 2048, 4096 + 512])
def test_expand_runs_matches_naive(seed, S):
    rng = np.random.default_rng(seed)
    N = 700
    cnt = rng.integers(0, 9, N).astype(np.int32)
    cnt[rng.uniform(size=N) < 0.3] = 0  # plenty of empty runs
    offs = np.cumsum(cnt) - cnt
    total = int(offs[-1] + cnt[-1])
    vals = np.stack(
        [
            rng.integers(0, 1 << 22, N).astype(np.float32),  # int channel
            rng.normal(size=N).astype(np.float32) * 1e3,  # f32 channel
            rng.normal(size=N).astype(np.float32) * 1e-4,
            rng.integers(0, 1 << 20, N).astype(np.float32),
        ]
    )
    out = expand_runs(
        jnp.asarray(vals),
        jnp.asarray(offs.astype(np.int32)),
        jnp.asarray(total, jnp.int32),
        S,
        interpret=True,
    )
    ref = _naive(vals, offs, total, S)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_expand_runs_overflow_clamped():
    """Runs crossing / beyond the slot capacity are clamped, not OOB."""
    offs = np.array([0, 5, 9], np.int32)
    vals = np.array([[3.0, 7.0, 11.0]], np.float32)
    out = expand_runs(
        jnp.asarray(vals), jnp.asarray(offs), jnp.asarray(12, jnp.int32), 8,
        interpret=True,
    )
    ref = _naive(vals, offs, 12, 8)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_expand_runs_all_empty():
    offs = np.zeros(16, np.int32)
    vals = np.ones((2, 16), np.float32)
    out = expand_runs(
        jnp.asarray(vals), jnp.asarray(offs), jnp.asarray(0, jnp.int32), 1024,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.zeros((2, 1024)))


def test_expand_runs_rejects_2pow24_runs():
    """Integer channels ride the f32 select-matmul, exact only below
    2^24 — the guard must fail loudly instead of rounding ids
    (ADVICE r4)."""
    import jax.numpy as jnp
    import pytest

    from street_gaussians_tpu.ops.fill import expand_runs

    N = 2 ** 24
    vals = jnp.zeros((1, N), jnp.float32)
    offs = jnp.zeros((N,), jnp.int32)
    with pytest.raises(ValueError, match="2\\*\\*24"):
        expand_runs(vals, offs, jnp.asarray(0, jnp.int32), 512)
