"""CLI: flatten the composite scene at one frame into a single standard
3DGS PLY for SIBR-style viewers (ref analog: make_ply.py:15-79 — actor
Gaussians transformed to world space, Fourier features collapsed at the
frame's time, one 'vertex' element)."""

import os

import numpy as np

from street_gaussians_tpu.config import config_from_args, make_argparser


def main():
    import jax
    import jax.numpy as jnp

    from street_gaussians_tpu import checkpoint as ckpt_lib
    from street_gaussians_tpu import train_lib
    from street_gaussians_tpu.models.renderer import compose_frame
    from street_gaussians_tpu.runner import build_initial_params, build_scene, render_opts_from_cfg
    from street_gaussians_tpu.utils import ply as ply_utils

    args = make_argparser("street_gaussians_tpu make_ply").parse_args()
    cfg = config_from_args(args)
    cfg.mode = "evaluate"
    frame_id = cfg.get("viewer", {}).get("frame_id", 0)

    scene = build_scene(cfg)
    params = build_initial_params(cfg, scene)
    state = train_lib.init_train_state(params, scene.aux_init)
    restored, it = ckpt_lib.load_train_state(cfg.trained_model_dir, state)
    if restored is not None:
        state = restored
        print(f"[make_ply] loaded iteration {it}")
    else:
        it = 0
        print("[make_ply] no checkpoint found; exporting the initial model")

    views = sorted(scene.all_views, key=lambda v: v.frame_idx)
    view = next((v for v in views if v.frame_idx == frame_id), None)
    if view is None:
        raise ValueError(f"no camera with frame_idx {frame_id}")

    opts = render_opts_from_cfg(cfg, "eval")
    composed = compose_frame(
        state.params, state.aux, scene.table, scene.pose_data,
        view.frame_input, step=jnp.asarray(10 ** 9), opts=opts,
    )

    alive = np.asarray(composed["visible"])
    xyz = np.asarray(composed["means3d"])[alive]
    shs = np.asarray(composed["shs"])[alive]  # [N, K, 3]
    opacity = np.clip(np.asarray(jax.nn.sigmoid(state.params.gaussians.opacity_logit))[alive, 0], 1e-6, 1 - 1e-6)
    scale = np.asarray(state.params.gaussians.log_scale)[alive]
    rot = np.asarray(composed["quats"])[alive]

    f_dc = shs[:, 0, :]  # [N, 3]
    f_rest = shs[:, 1:, :].transpose(0, 2, 1).reshape(xyz.shape[0], -1)

    fields = (
        [(k, "f4") for k in ("x", "y", "z", "nx", "ny", "nz")]
        + [(f"f_dc_{i}", "f4") for i in range(3)]
        + [(f"f_rest_{i}", "f4") for i in range(f_rest.shape[1])]
        + [("opacity", "f4")]
        + [(f"scale_{i}", "f4") for i in range(3)]
        + [(f"rot_{i}", "f4") for i in range(4)]
    )
    arr = np.zeros(xyz.shape[0], dtype=fields)
    arr["x"], arr["y"], arr["z"] = xyz.T
    for i in range(3):
        arr[f"f_dc_{i}"] = f_dc[:, i]
    for i in range(f_rest.shape[1]):
        arr[f"f_rest_{i}"] = f_rest[:, i]
    arr["opacity"] = np.log(opacity / (1 - opacity))
    for i in range(3):
        arr[f"scale_{i}"] = scale[:, i]
    for i in range(4):
        arr[f"rot_{i}"] = rot[:, i]

    out_dir = os.path.join(
        cfg.model_path, "viewer", f"{frame_id:06d}", "point_cloud",
        f"iteration_{cfg.train.iterations}",
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "point_cloud.ply")
    ply_utils.write_ply(path, {"vertex": arr})
    print(f"[make_ply] wrote {xyz.shape[0]} gaussians to {path}")


if __name__ == "__main__":
    main()
