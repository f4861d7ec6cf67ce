"""Quaternion algebra in pure jnp (batched over leading axes).

Convention: quaternions are (w, x, y, z), matching the reference
framework's convention (ref: lib/utils/general_utils.py:103-303,
cuda_rasterizer/forward.cu:118-152).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion(s) [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3].

    Matches the row-major matrix built in the reference rasterizer
    (ref: cuda_rasterizer/forward.cu:134-138) and
    lib/utils/general_utils.py:180-200.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w,x,y,z).

    Branch-free (all four candidate constructions computed, the
    best-conditioned one selected) so it jits with no data-dependent
    control flow (ref equivalent: lib/utils/general_utils.py:103-145).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate 0: trace-dominant
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack(
        [0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0],
        axis=-1,
    )
    # candidate 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack(
        [(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1],
        axis=-1,
    )
    # candidate 2: m11 dominant
    s2 = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack(
        [(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2],
        axis=-1,
    )
    # candidate 3: m22 dominant
    s3 = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack(
        [(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3],
        axis=-1,
    )

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both [..., 4] (w,x,y,z).

    (ref: lib/utils/general_utils.py:220-238 quaternion_raw_multiply)
    """
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    w = aw * bw - ax * bx - ay * by - az * bz
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by - ax * bz + ay * bw + az * bx
    z = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack([w, x, y, z], axis=-1)


def quat_multiply_yaw(theta: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Left-multiply q by a rotation of angle theta about +z (yaw).

    Used by the actor-pose refinement, where the learnable rotation
    residual is a scalar yaw (ref: lib/utils/general_utils.py:240-259
    quaternion_raw_multiply_theta).
    """
    half = theta * 0.5
    a = jnp.stack(
        [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)],
        axis=-1,
    )
    return quat_multiply(a, q)


def quat_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion (ref: general_utils.py:261-275)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical linear interpolation between unit quaternions.

    t broadcasts against the batch shape of q0/q1 ([...] -> [..., 4]).
    Falls back to lerp when the quaternions are nearly parallel
    (ref behaviour: roma slerp used at lib/utils/general_utils.py:277-303).
    """
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    # take the short way around
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)

    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)

    near = dot > 1.0 - 1e-6
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-12))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12))
    return quat_normalize(w0 * q0 + w1 * q1)


def build_scaling_rotation(scale: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(scale): [..., 3, 3] such that cov3d = L @ L^T.

    (ref: lib/utils/general_utils.py:305-314; the rasterizer computes
    M = S*R row-major then Sigma = M^T M, cuda_rasterizer/forward.cu:140-143,
    which equals (R S)(R S)^T = L L^T.)
    """
    r = quat_to_rotmat(quat_normalize(q))
    return r * scale[..., None, :]
