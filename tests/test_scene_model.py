"""Scene-graph model tests: packing, composite rendering, Adam parity
with torch, densification invariants, and a short end-to-end training
run on a synthetic scene (the test strategy from SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_tpu.config import default_config
from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models import gaussians as G
from street_gaussians_tpu.models.renderer import (
    RenderOptions,
    SceneParams,
    render_background_mask,
    render_frame,
    render_object_mask,
)
from street_gaussians_tpu.models.sky_cubemap import init_sky, sample_cubemap
from street_gaussians_tpu import train_lib
from street_gaussians_tpu.train_lib import GroundTruth, TrainState


OPTS = RenderOptions(
    mode="train",
    tile_capacity=256,
    instance_capacity=2 ** 15,
    interpret=True,  # Pallas interpreter on CPU
)


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(num_bkgd=300, num_actors=2, H=48, W=64)


def make_params(scene, sky=False):
    return SceneParams(
        gaussians=scene.params_init,
        actor_pose=scene.pose_params_init,
        sky=init_sky(64, white_background=False) if sky else None,
        color_correction=None,
        pose_correction=None,
    )


def test_pack_scene_layout(scene):
    t = scene.table
    assert t.names[0] == "background"
    assert t.num_models == 3
    # slices are disjoint and cover the capacity
    assert t.slices[0][0] == 0
    assert t.slices[-1][1] == t.capacity
    mid = np.asarray(scene.aux.model_id)
    for m, (s, e) in enumerate(t.slices):
        assert (mid[s:e] == m).all()
    # alive rows only inside their slices with the initial points
    alive = np.asarray(scene.aux.alive)
    assert alive.sum() > 0


def test_render_frame_shapes(scene):
    params = make_params(scene, sky=True)
    frame = scene.frames[3]
    out = render_frame(
        params,
        scene.aux,
        scene.table,
        scene.pose_data,
        frame,
        step=jnp.asarray(1000),
        key=jax.random.PRNGKey(0),
        opts=OPTS,
    )
    H, W = frame.cam.H, frame.cam.W
    assert out["rgb"].shape == (H, W, 3)
    assert out["depth"].shape == (H, W)
    assert out["acc"].shape == (H, W)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # something visible
    assert float(out["acc"].max()) > 0.1


def test_render_subsets_compose(scene):
    """Object-only and background-only renders differ and the object
    render shows actors only (ref: street_gaussian_renderer.py:13-72)."""
    params = make_params(scene)
    frame = scene.frames[4]
    kw = dict(step=jnp.asarray(0), opts=dataclasses.replace(OPTS, mode="eval"))
    full = render_frame(params, scene.aux, scene.table, scene.pose_data, frame, **kw)
    obj = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        include_mask=render_object_mask(scene.table), **kw,
    )
    bkg = render_frame(
        params, scene.aux, scene.table, scene.pose_data, frame,
        include_mask=render_background_mask(scene.table), **kw,
    )
    acc_full = float(full["acc"].sum())
    acc_obj = float(obj["acc"].sum())
    acc_bkg = float(bkg["acc"].sum())
    assert acc_obj > 0  # actors visible
    assert acc_obj < acc_bkg  # objects cover fewer pixels than background
    assert acc_full > max(acc_obj, acc_bkg) * 0.99


def test_actor_moves_with_tracklet(scene):
    """The same actor renders at different image positions at different
    frames (tracklet motion through the scene graph)."""
    params = make_params(scene)
    kw = dict(step=jnp.asarray(0), opts=dataclasses.replace(OPTS, mode="eval"))
    mask = render_object_mask(scene.table)
    a0 = render_frame(
        params, scene.aux, scene.table, scene.pose_data, scene.frames[0],
        include_mask=mask, **kw,
    )["acc"]
    a1 = render_frame(
        params, scene.aux, scene.table, scene.pose_data, scene.frames[-1],
        include_mask=mask, **kw,
    )["acc"]
    # occupied-pixel centroids move in x
    xs = np.arange(a0.shape[1])[None, :]
    c0 = float((np.asarray(a0) * xs).sum() / (np.asarray(a0).sum() + 1e-9))
    c1 = float((np.asarray(a1) * xs).sum() / (np.asarray(a1).sum() + 1e-9))
    assert abs(c1 - c0) > 3.0


def test_sky_cubemap_sampling_matches_faces():
    """Cube sampling returns each face's color for its axis direction."""
    R = 8
    cm = np.zeros((6, R, R, 3), np.float32)
    for f in range(6):
        cm[f] = (f + 1) / 6.0
    dirs = jnp.asarray(
        np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
            np.float32,
        )
    )
    out = sample_cubemap(jnp.asarray(cm), dirs)
    expected = (np.arange(6) + 1) / 6.0
    np.testing.assert_allclose(np.asarray(out)[:, 0], expected, atol=1e-6)


def test_adam_matches_torch():
    """Masked Adam vs torch.optim.Adam (eps 1e-15) on a toy problem."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    lr = 0.01

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=lr, eps=1e-15)
    from street_gaussians_tpu.optim.adam import adam_init, adam_update

    jw = jnp.asarray(w0)
    st = adam_init({"w": jw})
    for i in range(10):
        g = rng.normal(size=(5, 3)).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
        (jw_new, st) = adam_update({"w": jw}, {"w": jnp.asarray(g)}, st, {"w": lr})
        jw = jw_new["w"]
    np.testing.assert_allclose(np.asarray(jw), tw.detach().numpy(), atol=1e-5)


def _toy_cfg():
    cfg = default_config()
    cfg.optim.lambda_sky = 0.0
    cfg.optim.lambda_reg = 0.0
    cfg.optim.lambda_depth_lidar = 0.0
    cfg.optim.densify_until_iter = 10 ** 9
    return cfg


def test_train_step_decreases_loss(scene):
    cfg = _toy_cfg()
    params = make_params(scene)
    state = train_lib.init_train_state(params, scene.aux)
    step_fn = train_lib.make_train_step(
        cfg, scene.table, scene.pose_data, OPTS, donate=False
    )

    # ground truth = render from a slightly different (target) model:
    # brighter features
    gt_params = dataclasses.replace(
        params,
        gaussians=dataclasses.replace(
            params.gaussians, feat_dc=params.gaussians.feat_dc + 0.3
        ),
    )
    frame = scene.frames[2]
    gt_img = render_frame(
        gt_params, scene.aux, scene.table, scene.pose_data, frame,
        step=jnp.asarray(0), opts=dataclasses.replace(OPTS, mode="eval"),
    )["rgb"]
    H, W = frame.cam.H, frame.cam.W
    gt = GroundTruth(
        image=gt_img,
        mask=jnp.ones((H, W, 1), bool),
        sky_mask=jnp.zeros((H, W, 1), bool),
        lidar_depth=jnp.zeros((H, W)),
        obj_bound=jnp.zeros((H, W, 1), bool),
        sky_scale=jnp.ones(()),
    )
    losses = []
    for i in range(15):
        state, scalars = step_fn(state, frame, gt, jax.random.PRNGKey(i))
        losses.append(float(scalars["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_densify_invariants(scene):
    cfg = _toy_cfg()
    params = make_params(scene)
    state = train_lib.init_train_state(params, scene.aux)
    # fake stats: large gradients on some alive background rows
    alive = np.asarray(state.aux.alive)
    accum = np.zeros((scene.table.capacity, 2), np.float32)
    idx = np.where(alive)[0][:50]
    accum[idx] = 1.0
    state = dataclasses.replace(
        state,
        aux=dataclasses.replace(
            state.aux,
            grad_accum=jnp.asarray(accum),
            denom=jnp.asarray(alive.astype(np.float32)),
        ),
    )
    densify_fn = train_lib.make_densify_fn(cfg, scene.table)
    n_before = int(jnp.sum(state.aux.alive))
    state2, diag = densify_fn(state, jax.random.PRNGKey(0), jnp.asarray(False))
    n_after = int(jnp.sum(state2.aux.alive))
    assert n_after > n_before  # clones/splits landed
    # rows stay inside their model slices
    mid = np.asarray(state2.aux.model_id)
    for m, (s, e) in enumerate(scene.table.slices):
        assert (mid[s:e] == m).all()
    # no NaNs introduced
    assert np.isfinite(np.asarray(state2.params.gaussians.xyz)).all()
    assert int(diag["points_clone"]) + int(diag["points_split"]) > 0


def test_opacity_reset(scene):
    params = make_params(scene)
    state = train_lib.init_train_state(params, scene.aux)
    reset_fn = train_lib.make_reset_opacity_fn()
    state2 = reset_fn(state)
    op = jax.nn.sigmoid(state2.params.gaussians.opacity_logit)
    assert float(op.max()) <= 0.01 + 1e-5


def test_sky_cubemap_structured_backward_matches_scatter():
    """The sort + segment-sum cubemap gradient must equal the plain
    4-tap scatter-add VJP."""
    import jax
    from street_gaussians_tpu.models.sky_cubemap import sample_cubemap

    rng = np.random.default_rng(5)
    R = 16
    cm = jnp.asarray(rng.random((6, R, R, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((40, 30, 3)).astype(np.float32))
    dl = jnp.asarray(rng.standard_normal((40, 30, 3)).astype(np.float32))

    def loss_structured(cm):
        return jnp.sum(sample_cubemap(cm, dirs, interpret=True) * dl)

    def loss_naive(cm):
        # reproduce the tap math with plain autodiff (scatter-add VJP)
        from street_gaussians_tpu.models import sky_cubemap as S

        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        is_x = (ax >= ay) & (ax >= az)
        is_y = (~is_x) & (ay >= az)
        face = jnp.where(
            is_x,
            jnp.where(x > 0, 0, 1),
            jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
        )
        major = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-12)
        u = jnp.where(
            is_x, jnp.where(x > 0, -z, z),
            jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
        ) / major
        v = jnp.where(
            is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y)
        ) / major
        px = (u + 1.0) * 0.5 * R - 0.5
        py = (v + 1.0) * 0.5 * R - 0.5
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = (px - x0)[..., None]
        fy = (py - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, R - 1)
        x1i = jnp.clip(x0i + 1, 0, R - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, R - 1)
        y1i = jnp.clip(y0i + 1, 0, R - 1)
        flat = cm.reshape(-1, 3)
        base = face * (R * R)
        c00 = jnp.take(flat, base + y0i * R + x0i, axis=0)
        c01 = jnp.take(flat, base + y0i * R + x1i, axis=0)
        c10 = jnp.take(flat, base + y1i * R + x0i, axis=0)
        c11 = jnp.take(flat, base + y1i * R + x1i, axis=0)
        out = (
            c00 * (1 - fx) * (1 - fy)
            + c01 * fx * (1 - fy)
            + c10 * (1 - fx) * fy
            + c11 * fx * fy
        )
        return jnp.sum(out * dl)

    v1, v2 = float(loss_structured(cm)), float(loss_naive(cm))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    g1 = jax.grad(loss_structured)(cm)
    g2 = jax.grad(loss_naive)(cm)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
