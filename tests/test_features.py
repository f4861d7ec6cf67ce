"""Feature-level model tests: semantic channels, Fourier appearance,
color/pose corrections, sky-as-Gaussians, actor pose residuals."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models import gaussians as G
from street_gaussians_tpu.models.corrections import (
    apply_color_correction,
    init_color_correction,
    init_pose_correction,
)
from street_gaussians_tpu.models.renderer import (
    RenderOptions,
    SceneParams,
    compose_frame,
    render_frame,
)

OPTS = RenderOptions(
    mode="eval", tile_capacity=128, instance_capacity=2 ** 14, interpret=True
)


def make_scene(**kw):
    return make_synthetic_scene(num_bkgd=200, num_actors=1, H=32, W=48, **kw)


def test_semantic_channels_render():
    scene = make_scene(use_semantic=True, num_classes=8)
    params = SceneParams(scene.params_init, scene.pose_params_init, None, None, None)
    opts = dataclasses.replace(OPTS, use_semantic=True)
    out = render_frame(
        params, scene.aux, scene.table, scene.pose_data, scene.frames[2],
        step=jnp.asarray(0), opts=opts,
    )
    assert out["semantic"].shape == (32, 48, 8)
    assert np.isfinite(np.asarray(out["semantic"])).all()


def test_fourier_time_variation():
    """With fourier_dim > 1 an actor's DC features vary with the frame
    (4D appearance, ref: gaussian_model_actor.py:71-80); background
    features do not."""
    scene = make_scene(fourier_dim=4)
    g = scene.params_init
    # give the actor nonzero higher fourier coefficients
    s, e = scene.table.slice_of(scene.table.names[1])
    feat = np.array(g.feat_dc)
    feat[s:e, 1:, :] = 0.5
    params = SceneParams(
        dataclasses.replace(g, feat_dc=jnp.asarray(feat)),
        scene.pose_params_init, None, None, None,
    )
    c0 = compose_frame(
        params, scene.aux, scene.table, scene.pose_data, scene.frames[0],
        step=jnp.asarray(0), opts=OPTS,
    )
    c1 = compose_frame(
        params, scene.aux, scene.table, scene.pose_data, scene.frames[3],
        step=jnp.asarray(0), opts=OPTS,
    )
    actor_diff = float(
        jnp.abs(c0["shs"][s:e, 0] - c1["shs"][s:e, 0]).max()
    )
    bs, be = scene.table.slice_of("background")
    bkgd_diff = float(jnp.abs(c0["shs"][bs:be, 0] - c1["shs"][bs:be, 0]).max())
    assert actor_diff > 1e-3
    assert bkgd_diff < 1e-7


def test_color_correction_applies():
    cc = init_color_correction(4)
    # scale red channel of image 2
    affine = np.array(cc.affine)
    affine[2, 0, 0] = 2.0
    cc = dataclasses.replace(cc, affine=jnp.asarray(affine))
    img = jnp.ones((8, 8, 3)) * 0.25
    out = apply_color_correction(cc, 2, img)
    np.testing.assert_allclose(np.asarray(out[..., 0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., 1]), 0.25, atol=1e-6)
    out_other = apply_color_correction(cc, 1, img)
    np.testing.assert_allclose(np.asarray(out_other[..., 0]), 0.25, atol=1e-6)


def test_pose_correction_moves_background():
    scene = make_scene()
    pc = init_pose_correction(len(scene.frames))
    trans = np.zeros((len(scene.frames), 3), np.float32)
    trans[0] = [0.5, 0.0, 0.0]
    pc = dataclasses.replace(pc, trans=jnp.asarray(trans))
    params = SceneParams(scene.params_init, scene.pose_params_init, None, None, pc)
    opts = dataclasses.replace(OPTS, mode="train")
    c = compose_frame(
        params, scene.aux, scene.table, scene.pose_data, scene.frames[0],
        step=jnp.asarray(0), opts=opts,
    )
    base = compose_frame(
        SceneParams(scene.params_init, scene.pose_params_init, None, None, None),
        scene.aux, scene.table, scene.pose_data, scene.frames[0],
        step=jnp.asarray(0), opts=opts,
    )
    bs, be = scene.table.slice_of("background")
    shift = np.asarray(c["means3d"][bs:be] - base["means3d"][bs:be])
    np.testing.assert_allclose(
        shift, np.tile([0.5, 0, 0], (shift.shape[0], 1)), atol=1e-5
    )


def test_sky_gaussians_projected_to_sphere():
    rng = np.random.default_rng(0)
    sky_pts = rng.normal(size=(64, 3)).astype(np.float32) * 3.0
    sky_cols = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    params, aux, table = G.pack_scene(
        {"background": rng.normal(size=(50, 3)).astype(np.float32)},
        {"background": rng.uniform(0, 1, (50, 3)).astype(np.float32)},
        sky_points=sky_pts,
        sky_colors=sky_cols,
        sphere_radius=10.0,
    )
    assert table.names[-1] == "sky"
    assert table.sky_model == table.num_models - 1
    sp = SceneParams(params, None, None, None, None)
    from street_gaussians_tpu.models.renderer import FrameInput
    from street_gaussians_tpu.utils.camera import make_camera

    K = np.array([[40.0, 0, 24], [0, 40, 16], [0, 0, 1]], np.float32)
    cam = make_camera(K, np.eye(4), 32, 48)
    fi = FrameInput(
        cam=cam,
        ego_quat=jnp.array([1.0, 0, 0, 0]),
        ego_rotmat=jnp.eye(3),
        ego_trans=jnp.zeros(3),
        interp=None,
    )
    c = compose_frame(sp, aux, table, None, fi, step=jnp.asarray(0), opts=OPTS)
    s, e = table.slice_of("sky")
    d = np.linalg.norm(
        np.asarray(c["means3d"][s:e]) - table.sphere_center[None], axis=-1
    )
    alive = np.asarray(aux.alive[s:e])
    assert (d[alive] >= 2 * table.sphere_radius - 1e-3).all()


def test_actor_pose_residual_shifts_actor():
    scene = make_scene()
    pp = scene.pose_params_init
    opt_trans = np.zeros(np.asarray(pp.opt_trans).shape, np.float32)
    opt_trans[:, 0, :] = [1.0, 0.0, 0.0]  # column 0 = the single actor
    pp2 = dataclasses.replace(pp, opt_trans=jnp.asarray(opt_trans))
    base = compose_frame(
        SceneParams(scene.params_init, pp, None, None, None),
        scene.aux, scene.table, scene.pose_data, scene.frames[1],
        step=jnp.asarray(0), opts=OPTS,
    )
    moved = compose_frame(
        SceneParams(scene.params_init, pp2, None, None, None),
        scene.aux, scene.table, scene.pose_data, scene.frames[1],
        step=jnp.asarray(0), opts=OPTS,
    )
    s, e = scene.table.slice_of(scene.table.names[1])
    shift = np.asarray(moved["means3d"][s:e] - base["means3d"][s:e])
    np.testing.assert_allclose(shift, [[1.0, 0, 0]] * (e - s), atol=1e-5)


def test_normal_rendering():
    scene = make_scene()
    params = SceneParams(scene.params_init, scene.pose_params_init, None, None, None)
    opts = dataclasses.replace(OPTS, render_normal=True)
    out = render_frame(
        params, scene.aux, scene.table, scene.pose_data, scene.frames[2],
        step=jnp.asarray(0), opts=opts,
    )
    assert out["normals"].shape == (32, 48, 3)
    n = np.asarray(out["normals"])
    assert np.isfinite(n).all()
    norms = np.linalg.norm(n, axis=-1)
    # normalized wherever anything rendered
    acc = np.asarray(out["acc"])
    assert np.allclose(norms[acc > 0.5], 1.0, atol=1e-3)


def test_normal_and_semantic_together():
    scene = make_scene(use_semantic=True, num_classes=5)
    params = SceneParams(scene.params_init, scene.pose_params_init, None, None, None)
    opts = dataclasses.replace(OPTS, render_normal=True, use_semantic=True)
    out = render_frame(
        params, scene.aux, scene.table, scene.pose_data, scene.frames[1],
        step=jnp.asarray(0), opts=opts,
    )
    assert out["normals"].shape == (32, 48, 3)
    assert out["semantic"].shape == (32, 48, 5)


def test_sky_bf16_pair_pack_roundtrip():
    """The TPU sort path packs gradient channels as bf16 pairs in u32
    words; the round-trip must be exactly astype(bf16).astype(f32) —
    the rounding the segsum matmul applies to addends anyway — with the
    hi/lo pairing preserved (a channel swap here would permute all 12
    sky-gradient channels on TPU only)."""
    import numpy as np
    import jax.numpy as jnp
    from street_gaussians_tpu.ops.segsum import (
        pack_bf16_pair as _pack_bf16_pair,
        unpack_bf16_pair as _unpack_bf16_pair,
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 1e-3)
    b = jnp.asarray(rng.standard_normal(4096).astype(np.float32) * 10)
    hi, lo = _unpack_bf16_pair(_pack_bf16_pair(a, b))
    np.testing.assert_array_equal(
        np.asarray(hi), np.asarray(a.astype(jnp.bfloat16).astype(jnp.float32))
    )
    np.testing.assert_array_equal(
        np.asarray(lo), np.asarray(b.astype(jnp.bfloat16).astype(jnp.float32))
    )
