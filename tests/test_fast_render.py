"""Eval serving fast path (VERDICT r2 item 4): sky sampled on a 1/N ray
grid + bilinear upsample. Mechanism tests here (CPU); the end-to-end
max-pixel-error bound on a TRAINED 1600 px scene is measured on TPU and
recorded in docs/perf_journal.md."""

import dataclasses

import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from street_gaussians_tpu.models.renderer import render_frame
from street_gaussians_tpu.models.sky_cubemap import SkyParams


def _smooth_cubemap(R=64):
    """A smooth directional gradient — the character of a trained sky."""
    faces = []
    for f in range(6):
        u = np.linspace(-1, 1, R)[None, :].repeat(R, 0)
        v = np.linspace(-1, 1, R)[:, None].repeat(R, 1)
        base = 0.3 + 0.1 * f / 6.0
        img = np.stack(
            [base + 0.2 * u, base + 0.2 * v, base + 0.1 * (u + v)], axis=-1
        )
        faces.append(img)
    return SkyParams(cubemap=jnp.asarray(np.clip(np.stack(faces), 0, 1), jnp.float32))


def test_sky_downsample_parity_smooth_sky():
    scene, params, opts = ge._toy_setup(num_actors=0, H=64, W=96)
    params = dataclasses.replace(params, sky=_smooth_cubemap())
    opts = dataclasses.replace(opts, mode="eval")
    frame = scene.frames[1]

    exact = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts,
    )["rgb"]
    fast = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9),
        opts=dataclasses.replace(opts, sky_downsample=2),
    )["rgb"]
    assert fast.shape == exact.shape
    err = float(jnp.max(jnp.abs(fast - exact)))
    # 64px toy camera has much higher angular rate per pixel than the
    # 1600px serving camera, so this bound is far looser than the
    # measured serving bound; it catches grid-alignment mistakes (an
    # off-by-half-pixel misalignment reads ~0.05 here)
    assert err < 2.5 / 255.0, f"sky downsample parity err {err}"


def test_sky_downsample_exact_for_constant_sky():
    scene, params, opts = ge._toy_setup(num_actors=0, H=64, W=96)
    const = SkyParams(
        cubemap=jnp.full((6, 32, 32, 3), 0.42, jnp.float32)
    )
    params = dataclasses.replace(params, sky=const)
    opts = dataclasses.replace(opts, mode="eval")
    frame = scene.frames[1]
    exact = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts,
    )["rgb"]
    fast = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9),
        opts=dataclasses.replace(opts, sky_downsample=2),
    )["rgb"]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-6)


def test_sky_downsample_ignored_in_train_mode():
    """Train mode must keep the exact full-res jittered sampling."""
    scene, params, opts = ge._toy_setup(num_actors=0, H=64, W=96)
    params = dataclasses.replace(params, sky=_smooth_cubemap())
    frame = scene.frames[1]
    import jax

    train_opts = dataclasses.replace(opts, mode="train", sky_downsample=2)
    out = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=train_opts,
        key=jax.random.PRNGKey(0),
    )["rgb"]
    ref = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9),
        opts=dataclasses.replace(opts, mode="train", sky_downsample=1),
        key=jax.random.PRNGKey(0),
    )["rgb"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_sky_table_cache_bit_identical():
    """Serving-path cached sky window table (build_sky_table) must be
    BIT-identical to the default per-frame build — same _combine_taps on
    the same table values, just hoisted out of the frame loop."""
    from street_gaussians_tpu.models.sky_cubemap import build_sky_table

    scene, params, opts = ge._toy_setup(num_actors=0, H=64, W=96)
    params = dataclasses.replace(params, sky=_smooth_cubemap())
    opts = dataclasses.replace(opts, mode="eval")
    frame = scene.frames[1]

    exact = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts,
    )["rgb"]
    tbl = build_sky_table(params.sky.cubemap)
    cached = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts, sky_table=tbl,
    )["rgb"]
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(exact))


def test_sky_table_cache_composes_with_downsample():
    from street_gaussians_tpu.models.sky_cubemap import build_sky_table

    scene, params, opts = ge._toy_setup(num_actors=0, H=64, W=96)
    params = dataclasses.replace(params, sky=_smooth_cubemap())
    opts = dataclasses.replace(opts, mode="eval", sky_downsample=2)
    frame = scene.frames[1]
    plain = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts,
    )["rgb"]
    tbl = build_sky_table(params.sky.cubemap)
    cached = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(10 ** 9), opts=opts, sky_table=tbl,
    )["rgb"]
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(plain))
