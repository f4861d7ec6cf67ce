"""Sky cubemap stage breakdown at bench scale (TPU).

HARNESS CAVEAT: eager-chained timing through the axon tunnel is only
trustworthy for coarse (>5 ms) stages; for fine-grained op timing use an
in-jit lax.fori_loop chain (see docs/perf_journal.md measurement note).

Usage: python script/probe_sky.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.models import sky_cubemap as S
from street_gaussians_tpu.utils.camera import camera_rays
from street_gaussians_tpu.data.synthetic import make_synthetic_scene


def timed(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = fn_j(jnp.zeros(()), *args)
    t = jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0.0
    float(t)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(t, *args)
        t = jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0] * 0.0
    float(t)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    H, W, R = 1064, 1600, 1024
    scene = make_synthetic_scene(num_bkgd=1024, num_actors=0, H=H, W=W)
    cam = scene.frames[2].cam
    sky = S.init_sky(R, white_background=False)
    cm = sky.cubemap

    timed("rays", lambda t, c: camera_rays(c) + t, cam)

    dirs = jax.jit(lambda c: camera_rays(c))(cam)

    def uv_only(t, cm, dirs):
        # face select + uv + weights, no gather: replicate sample_cubemap
        # up to e4/base
        d = dirs + t
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        is_x = (ax >= ay) & (ax >= az)
        is_y = (~is_x) & (ay >= az)
        face = jnp.where(is_x, jnp.where(x > 0, 0, 1),
                         jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)))
        major = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-12)
        u = jnp.where(is_x, jnp.where(x > 0, -z, z),
                      jnp.where(is_y, x, jnp.where(z > 0, x, -x))) / major
        v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y)) / major
        px = (u + 1.0) * 0.5 * R - 0.5
        py = (v + 1.0) * 0.5 * R - 0.5
        x0 = jnp.floor(px); y0 = jnp.floor(py)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, R - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, R - 1)
        return face * (R * R) + y0i * R + x0i

    timed("uv+face+base (no gather)", uv_only, cm, dirs)

    def fwd(t, cm, dirs):
        return S.sample_cubemap(cm + t, dirs)

    timed("sample_cubemap fwd", fwd, cm, dirs)

    def tbl_build(t, cm):
        flat = cm.reshape(-1, 3) + t
        return jnp.concatenate(
            [jnp.roll(flat, -off, axis=0) for off in (0, 1, R, R + 1)], axis=1
        )

    timed("  tbl build (3 rolls concat)", tbl_build, cm)

    def fwd_bwd(t, cm, dirs):
        def loss(cm):
            return jnp.sum(S.sample_cubemap(cm + t, dirs) ** 2) * 1e-3
        return jax.grad(loss)(cm)

    timed("sample_cubemap fwd+bwd", fwd_bwd, cm, dirs)

    # bwd pieces: vals build + sort + segsum
    base = jax.jit(uv_only)(jnp.zeros(()), cm, dirs)
    P = base.size
    rng = np.random.default_rng(0)
    e4 = jnp.asarray(rng.random((H, W, 4), np.float32))
    d_out = jnp.asarray(rng.random((H, W, 3), np.float32))

    def bwd_only(t, base, e4, d_out):
        res = (6 * R * R, base, e4 + t)
        return S._bt_bwd(R, False, res, d_out)[0]

    timed("  _bt_bwd alone", bwd_only, base, e4, d_out)

    def sort_only(t, base, e4, d_out):
        vals = (e4[..., :, None] * d_out[..., None, :]).reshape(P, 12) + t
        keys = base.reshape(-1)
        cap = 512
        L = (P + cap - 1) // cap * cap
        keys = jnp.pad(keys, (0, L - P), constant_values=(1 << 30))
        vals = jnp.pad(vals, ((0, L - P), (0, 0)))
        srt = jax.lax.sort((keys, *(vals[:, c] for c in range(12))), num_keys=1,
                           is_stable=False)
        return srt[0], srt[1]

    timed("  bwd: vals+pad+sort13", sort_only, base, e4, d_out)


if __name__ == "__main__":
    main()
