"""TPU-only: v1(table) vs v2(instance) rasterizer parity + timing.
Run on a real TPU: python script/tpu_parity_check.py
"""
"""v1 vs v2 rasterizer parity + timing on real TPU."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time
import dataclasses
import jax, jax.numpy as jnp, numpy as np
from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models.renderer import RenderOptions, SceneParams, compose_frame
from street_gaussians_tpu.ops.preprocess import preprocess_gaussians
from street_gaussians_tpu.ops.rasterize import RasterizeConfig, rasterize

H, W = 880, 1280
scene = make_synthetic_scene(num_bkgd=150_000, num_actors=4, H=H, W=W,
                             background_growth=3.0, actor_growth=3.0)
params = SceneParams(scene.params_init, scene.pose_params_init, None, None, None)
opts = RenderOptions(mode="eval")
frame = scene.frames[2]
cam = frame.cam

@jax.jit
def prep(params):
    c = compose_frame(params, scene.aux, scene.table, scene.pose_data, frame, jnp.asarray(10**9), opts=opts)
    return preprocess_gaussians(
        c["means3d"], c["scales"], c["quats"], c["opacity"], c["shs"],
        cam.w2c, cam.full_proj, cam.cam_center, cam.H, cam.W,
        cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy,
        sh_degree=3, alive=c["visible"])

screen = jax.block_until_ready(prep(params))

def run(layout, grad=False):
    cfg = RasterizeConfig(tile_capacity=1024, instance_capacity=2**21, layout=layout)
    if not grad:
        f = jax.jit(lambda s: rasterize(s, H, W, jnp.zeros(3), config=cfg))
        out = jax.block_until_ready(f(screen))
        t0 = time.time()
        for _ in range(10): out = f(screen)
        jax.block_until_ready(out)
        print(f"{layout} fwd: {(time.time()-t0)/10*1000:.1f} ms")
        return out
    else:
        def loss(mean2d, conic, opacity, rgb, depth):
            s = screen._replace(mean2d=mean2d, conic=conic, opacity=opacity, rgb=rgb, depth=depth)
            o = rasterize(s, H, W, jnp.zeros(3), config=cfg)
            return jnp.sum(o["rgb"]) + jnp.sum(o["depth"]) + jnp.sum(o["acc"])
        g = jax.jit(jax.grad(loss, argnums=(0,1,2,3,4)))
        args = (screen.mean2d, screen.conic, screen.opacity, screen.rgb, screen.depth)
        out = jax.block_until_ready(g(*args))
        t0 = time.time()
        for _ in range(10): out = g(*args)
        jax.block_until_ready(out)
        print(f"{layout} fwd+bwd: {(time.time()-t0)/10*1000:.1f} ms")
        return out

o1 = run("table")
o2 = run("instance")
for k in ("rgb", "depth", "acc"):
    d = float(jnp.max(jnp.abs(o1[k] - o2[k])))
    print(f"max|d{k}| = {d:.2e}")
    assert d < 1e-4, k

g1 = run("table", grad=True)
g2 = run("instance", grad=True)
for name, a, b in zip(("mean2d","conic","opacity","rgb","depth"), g1, g2):
    d = float(jnp.max(jnp.abs(a - b)))
    r = float(jnp.max(jnp.abs(a)))
    print(f"grad {name}: max|diff| {d:.3e} (scale {r:.3e})")
    assert d < 1e-3 * max(r, 1.0), name
print("V1/V2 PARITY OK")
