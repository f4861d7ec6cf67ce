"""One-step TPU-vs-interpret drift gate (VERDICT r2 item 3 / verify
skill): the TPU blend kernels run bf16x3 MXU prefix ops and bf16-packed
sorts, so their outputs drift ~1e-5 from the exact-f32 interpreter —
this script bounds that drift on a full composite forward+backward so
future kernel work keeps the gate.

Runs BOTH paths in one process: the compiled Pallas path on the default
accelerator and the interpret path on the CPU backend, compares loss and
per-leaf gradients. Exits non-zero when a bound is violated.

Bounds (empirical at round 3 on v5e, roughly double the observed drift):
  loss relative error           <= 1e-3
  gaussian-leaf grad cosine     >= 0.999, rel-L2 <= 3e-2 (knife-edge
      early-termination rows dominate the tail; cosine is the stronger
      signal; round-3 measured xyz cos 0.99994 / relL2 1.1e-2)
  sky.cubemap grad cosine       >= 0.998, rel-L2 <= 8e-2 (its backward
      sort packs gradients as bf16 pairs and the segment-sum matmul
      rounds addends to bf16 — round-3 measured cos 0.99902 /
      relL2 4.4e-2; the cubemap still trains to PSNR 50 on hardware,
      docs/convergence_r3_demo1600_tpu.jsonl)

Usage: python script/tpu_drift_check.py   (on a machine with a TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses

import jax

# make the CPU backend available NEXT TO the accelerator
_plat = os.environ.get("JAX_PLATFORMS", "") or "axon"
if "cpu" not in _plat:
    jax.config.update("jax_platforms", _plat + ",cpu")

import jax.numpy as jnp
import numpy as np

from street_gaussians_tpu.config import default_config
from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models.renderer import (
    RenderOptions,
    SceneParams,
    render_frame,
)
from street_gaussians_tpu.models.sky_cubemap import init_sky
from street_gaussians_tpu.train_lib import GroundTruth, compute_losses


def main() -> int:
    H, W = 320, 480
    scene = make_synthetic_scene(
        num_bkgd=20_000, num_actors=2, H=H, W=W,
        background_growth=2.0, actor_growth=2.0,
    )
    # anisotropic scales: the synthetic init is isotropic, which makes
    # rotation gradients EXACTLY zero (rotating a sphere is a no-op) —
    # skew the axes so the rot leaf carries real signal
    g = scene.params_init
    g = dataclasses.replace(
        g,
        log_scale=g.log_scale + jnp.asarray([0.45, -0.3, 0.15], jnp.float32),
    )
    params = SceneParams(
        gaussians=g,
        actor_pose=scene.pose_params_init,
        sky=init_sky(64, white_background=False),
        color_correction=None,
        pose_correction=None,
    )
    cfg = default_config()
    cfg.optim.lambda_sky = 0.05
    cfg.optim.lambda_depth_lidar = 0.05
    frame = scene.frames[1]
    rng = np.random.default_rng(0)
    gt = GroundTruth(
        image=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        mask=jnp.ones((H, W, 1), bool),
        sky_mask=jnp.zeros((H, W, 1), bool),
        lidar_depth=jnp.full((H, W), 8.0, jnp.float32),
        obj_bound=jnp.zeros((H, W, 1), bool),
        sky_scale=jnp.ones(()),
    )

    def make_fn(interpret):
        opts = RenderOptions(
            mode="eval",  # no RNG: identical math modulo kernel numerics
            tile_capacity=0,  # falsy = uncapped (normalized in render_frame)
            instance_capacity=2 ** 15,
            interpret=interpret,
        )

        def loss_fn(params):
            out = render_frame(
                params, scene.aux, scene.table, scene.pose_data, frame,
                step=jnp.asarray(10 ** 9), opts=opts,
            )
            loss, _ = compute_losses(
                out, None, gt, params, cfg, frame.cam.image_id,
                jnp.asarray(1.0),
            )
            return loss

        return jax.jit(jax.value_and_grad(loss_fn))

    dev_acc = jax.devices()[0]
    dev_cpu = jax.devices("cpu")[0]
    print(f"[drift] accelerator={dev_acc} vs interpret on {dev_cpu}")

    with jax.default_device(dev_acc):
        p_acc = jax.device_put(params, dev_acc)
        loss_a, grad_a = jax.block_until_ready(make_fn(False)(p_acc))
    with jax.default_device(dev_cpu):
        p_cpu = jax.device_put(params, dev_cpu)
        loss_c, grad_c = jax.block_until_ready(make_fn(True)(p_cpu))

    la, lc = float(loss_a), float(loss_c)
    rel = abs(la - lc) / max(abs(lc), 1e-12)
    print(f"[drift] loss tpu={la:.6f} interpret={lc:.6f} rel={rel:.2e}")
    ok = rel <= 1e-3

    leaves_a = {
        f"gaussians.{k}": getattr(grad_a.gaussians, k)
        for k in ("xyz", "log_scale", "rot", "opacity_logit", "feat_dc")
    }
    leaves_c = {
        f"gaussians.{k}": getattr(grad_c.gaussians, k)
        for k in ("xyz", "log_scale", "rot", "opacity_logit", "feat_dc")
    }
    if grad_a.sky is not None:
        leaves_a["sky.cubemap"] = grad_a.sky.cubemap
        leaves_c["sky.cubemap"] = grad_c.sky.cubemap
    for name in leaves_a:
        a = np.asarray(leaves_a[name], np.float64).ravel()
        c = np.asarray(leaves_c[name], np.float64).ravel()
        na, nc = np.linalg.norm(a), np.linalg.norm(c)
        if na == 0.0 and nc == 0.0:
            print(f"[drift] {name}: zero gradient on both paths (ok)")
            continue
        cos = float(a @ c / max(na * nc, 1e-30))
        rl2 = float(np.linalg.norm(a - c) / max(nc, 1e-30))
        cos_min, rl2_max = (0.998, 8e-2) if name == "sky.cubemap" else (0.999, 3e-2)
        print(f"[drift] {name}: cos={cos:.6f} relL2={rl2:.3e}")
        if cos < cos_min or rl2 > rl2_max:
            print(f"[drift] FAIL: {name} outside bounds", file=sys.stderr)
            ok = False

    print("[drift] PASS" if ok else "[drift] FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
