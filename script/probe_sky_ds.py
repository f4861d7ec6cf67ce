import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Max-channel-error of sky_downsample=2 vs exact, at the 1600px bench
scene with a smooth (trained-character) sky — the serving parity bound."""
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models.renderer import RenderOptions, SceneParams, render_frame
from street_gaussians_tpu.models.sky_cubemap import SkyParams, init_sky

H, W = 1064, 1600
scene = make_synthetic_scene(num_bkgd=220_000, num_actors=4, H=H, W=W,
                             background_growth=3.0, actor_growth=3.0)
R = 1024
faces = []
# continuous over the SPHERE (a trained sky is): color = f(direction)
for f in range(6):
    u = np.linspace(-1+1.0/R, 1-1.0/R, R)[None, :].repeat(R, 0)
    v = np.linspace(-1+1.0/R, 1-1.0/R, R)[:, None].repeat(R, 1)
    if f == 0:   d = np.stack([np.ones_like(u), -v, -u], -1)
    elif f == 1: d = np.stack([-np.ones_like(u), -v, u], -1)
    elif f == 2: d = np.stack([u, np.ones_like(u), v], -1)
    elif f == 3: d = np.stack([u, -np.ones_like(u), -v], -1)
    elif f == 4: d = np.stack([u, -v, np.ones_like(u)], -1)
    else:        d = np.stack([-u, -v, -np.ones_like(u)], -1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    img = np.stack([0.45 + 0.3*d[...,1], 0.5 + 0.25*d[...,1] + 0.1*d[...,0],
                    0.6 + 0.3*d[...,2]*0.5], -1)
    faces.append(np.clip(img, 0, 1))
sky = SkyParams(cubemap=jnp.asarray(np.stack(faces), jnp.float32))
params = SceneParams(gaussians=scene.params_init, actor_pose=scene.pose_params_init,
                     sky=sky, color_correction=None, pose_correction=None)
cap = 1536*1024
base_opts = RenderOptions(mode="eval", tile_capacity=cap, instance_capacity=cap)

@jax.jit
def render(p, aux, f, ds):
    return None  # placeholder

errs = []
for ds in (1, 2):
    opts = dataclasses.replace(base_opts, sky_downsample=ds)
    fn = jax.jit(lambda p, a, fr, o=opts: render_frame(
        p, a, scene.table, scene.pose_data, fr, step=jnp.asarray(10**9), opts=o)["rgb"])
    errs.append(jax.device_get(fn(params, scene.aux, scene.frames[2])))
err = np.abs(errs[0] - errs[1]).max()
print(f"max channel error ds=2 vs exact: {err:.6f} ({err*255:.3f}/255)")
