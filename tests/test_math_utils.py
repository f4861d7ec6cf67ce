"""Unit tests for the core math library (quaternions, SH, losses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_tpu.utils import losses, sh
from street_gaussians_tpu.utils.quaternion import (
    build_scaling_rotation,
    quat_invert,
    quat_multiply,
    quat_multiply_yaw,
    quat_normalize,
    quat_rotate,
    quat_slerp,
    quat_to_rotmat,
    rotmat_to_quat,
)


def rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return quat_normalize(q)


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(quat_to_rotmat(q), jnp.eye(3), atol=1e-6)

    def test_rotmat_orthogonal(self):
        q = rand_quats(jax.random.PRNGKey(0), 32)
        R = quat_to_rotmat(q)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(32), atol=1e-5)

    def test_roundtrip(self):
        q = rand_quats(jax.random.PRNGKey(1), 64)
        q2 = rotmat_to_quat(quat_to_rotmat(q))
        # q and -q are the same rotation
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-4)

    def test_multiply_matches_matrix_product(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        a, b = rand_quats(k1, 16), rand_quats(k2, 16)
        R_ab = quat_to_rotmat(quat_multiply(a, b))
        np.testing.assert_allclose(
            R_ab, quat_to_rotmat(a) @ quat_to_rotmat(b), atol=1e-5
        )

    def test_rotate_matches_matrix(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        q = rand_quats(k1, 16)
        v = jax.random.normal(k2, (16, 3))
        np.testing.assert_allclose(
            quat_rotate(q, v),
            jnp.einsum("nij,nj->ni", quat_to_rotmat(q), v),
            atol=1e-5,
        )

    def test_invert(self):
        q = rand_quats(jax.random.PRNGKey(4), 8)
        ident = quat_multiply(q, quat_invert(q))
        expect = jnp.tile(jnp.array([1.0, 0, 0, 0]), (8, 1))
        np.testing.assert_allclose(ident, expect, atol=1e-5)

    def test_yaw_multiply(self):
        theta = jnp.array([0.7])
        q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 1))
        out = quat_multiply_yaw(theta, q)
        R = quat_to_rotmat(out)[0]
        c, s = np.cos(0.7), np.sin(0.7)
        expect = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        np.testing.assert_allclose(R, expect, atol=1e-5)

    def test_slerp_endpoints_and_midpoint(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        q0, q1 = rand_quats(k1, 8), rand_quats(k2, 8)
        s0 = quat_slerp(q0, q1, jnp.zeros(8))
        np.testing.assert_allclose(jnp.abs(jnp.sum(s0 * q0, -1)), 1.0, atol=1e-4)
        s1 = quat_slerp(q0, q1, jnp.ones(8))
        np.testing.assert_allclose(jnp.abs(jnp.sum(s1 * q1, -1)), 1.0, atol=1e-4)
        # midpoint is equidistant
        sm = quat_slerp(q0, q1, jnp.full(8, 0.5))
        d0 = jnp.abs(jnp.sum(sm * q0, -1))
        d1 = jnp.abs(jnp.sum(sm * q1, -1))
        np.testing.assert_allclose(d0, d1, atol=1e-4)

    def test_build_scaling_rotation(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(6))
        q = rand_quats(k1, 8)
        s = jax.random.uniform(k2, (8, 3), minval=0.1, maxval=2.0)
        L = build_scaling_rotation(s, q)
        cov = L @ jnp.swapaxes(L, -1, -2)
        # eigenvalues of cov == squared scales
        eig = jnp.sort(jnp.linalg.eigvalsh(cov), axis=-1)
        np.testing.assert_allclose(eig, jnp.sort(s ** 2, axis=-1), rtol=1e-4)


class TestSH:
    def test_degree0_constant(self):
        shs = jnp.zeros((4, 3, 16)).at[:, :, 0].set(1.0)
        dirs = quat_rotate(
            rand_quats(jax.random.PRNGKey(0), 4), jnp.array([0.0, 0.0, 1.0])
        )
        out = sh.eval_sh(3, shs, dirs)
        np.testing.assert_allclose(out, sh.C0, atol=1e-6)

    def test_basis_matches_eval(self):
        key = jax.random.PRNGKey(7)
        shs = jax.random.normal(key, (16, 3, 16))
        dirs = quat_rotate(rand_quats(key, 16), jnp.array([0.0, 0.0, 1.0]))
        for deg in range(4):
            k = (deg + 1) ** 2
            via_eval = sh.eval_sh(deg, shs[:, :, :k], dirs)
            basis = sh.sh_basis(deg, dirs)
            via_basis = jnp.einsum("nk,nck->nc", basis, shs[:, :, :k])
            np.testing.assert_allclose(via_eval, via_basis, atol=1e-5)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_idft_basis(self):
        # matches the reference IDFT (lib/utils/sh_utils.py:120-130)
        t = jnp.array([0.25])
        basis = sh.idft_basis(t, 4)[0]
        expect = np.array(
            [
                1.0,
                np.sin(np.pi * 0.25 * 2),
                np.cos(np.pi * 0.25 * 2),
                np.sin(np.pi * 0.25 * 4),
            ]
        )
        np.testing.assert_allclose(basis, expect, atol=1e-6)


class TestLosses:
    def test_l1_masked(self):
        pred = jnp.ones((4, 4, 3))
        gt = jnp.zeros((4, 4, 3))
        mask = jnp.zeros((4, 4, 1)).at[0, 0].set(1.0)
        np.testing.assert_allclose(losses.l1_loss(pred, gt, mask), 1.0, atol=1e-6)
        np.testing.assert_allclose(losses.l1_loss(pred, gt), 1.0, atol=1e-6)

    def test_psnr(self):
        pred = jnp.full((8, 8, 3), 0.5)
        gt = jnp.full((8, 8, 3), 0.6)
        expect = -10 * np.log10(0.1 ** 2)
        np.testing.assert_allclose(losses.psnr(pred, gt), expect, rtol=1e-4)

    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(losses.ssim(img, img)) > 0.999

    def test_ssim_matches_reference_structure(self):
        # a noisier image scores lower
        key = jax.random.PRNGKey(1)
        img = jax.random.uniform(key, (32, 32, 3))
        noisy = jnp.clip(img + 0.3 * jax.random.normal(key, img.shape), 0, 1)
        assert float(losses.ssim(img, noisy)) < float(losses.ssim(img, img))

    def test_bce_and_entropy(self):
        p = jnp.array([0.5])
        t = jnp.array([1.0])
        np.testing.assert_allclose(
            losses.binary_cross_entropy(p, t), -np.log(0.5), rtol=1e-4
        )
        np.testing.assert_allclose(
            losses.entropy_loss(p), -np.log(0.5), rtol=1e-3
        )


def test_trimmed_l1_depth_bisection_matches_sort():
    """The bit-bisection threshold must EXACTLY equal the full-sort
    k-th-smallest (ref trimming semantics: train.py:125-132)."""
    import numpy as np
    import jax.numpy as jnp
    from street_gaussians_tpu.train_lib import trimmed_l1_depth

    rng = np.random.default_rng(0)
    for frac in (0.7, 0.0, 1.0, 0.01, 0.999):
        H, W = 37, 53
        exp = jnp.asarray(rng.random((H, W), np.float32) * 10)
        lid = jnp.asarray(rng.random((H, W), np.float32) * 10)
        mask = jnp.asarray(rng.random((H, W)) < frac)
        err = jnp.abs(exp - lid)
        fe = jnp.where(mask, err, jnp.inf).reshape(-1)
        n = jnp.sum(mask)
        k = jnp.maximum(jnp.floor(0.95 * n).astype(jnp.int32), 1)
        thr = jnp.sort(fe)[jnp.clip(k - 1, 0, fe.shape[0] - 1)]
        keep = (err <= thr) & mask & jnp.isfinite(err)
        want = jnp.sum(jnp.where(keep, err, 0.0)) / jnp.maximum(jnp.sum(keep), 1)
        got = trimmed_l1_depth(exp, lid, mask)
        assert float(got) == float(want)
