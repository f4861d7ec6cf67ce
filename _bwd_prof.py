"""Profile the backward-path pieces at 880x1280 scale."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models.renderer import RenderOptions, SceneParams, compose_frame
from street_gaussians_tpu.ops.preprocess import preprocess_gaussians, TILE
from street_gaussians_tpu.ops import binning as B
from street_gaussians_tpu.ops.tile_raster import payload_rows
from street_gaussians_tpu.ops.tile_raster2 import tile_blend_instances
from street_gaussians_tpu.utils import losses as L

H, W = 880, 1280
IC, TC = 2**21, 1024
scene = make_synthetic_scene(num_bkgd=150_000, num_actors=4, H=H, W=W,
                             background_growth=3.0, actor_growth=3.0)
params = SceneParams(scene.params_init, scene.pose_params_init, None, None, None)
opts = RenderOptions(mode="eval")
frame = scene.frames[2]; cam = frame.cam
gx = (W + TILE - 1)//TILE; gy = (H + TILE - 1)//TILE; NT = gx*gy

@jax.jit
def prep(params):
    c = compose_frame(params, scene.aux, scene.table, scene.pose_data, frame, jnp.asarray(10**9), opts=opts)
    return preprocess_gaussians(c["means3d"], c["scales"], c["quats"], c["opacity"], c["shs"],
        cam.w2c, cam.full_proj, cam.cam_center, cam.H, cam.W,
        cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy, sh_degree=3, alive=c["visible"])
screen = jax.block_until_ready(prep(params))
binf = jax.jit(lambda s: B.bin_gaussians_instances(s, gx, gy, IC, TC))
bins = jax.block_until_ready(binf(screen))
F = 4
c_pad = payload_rows(F)
feats = jnp.concatenate([screen.rgb, screen.depth[:,None]], -1)

def build_payload(mean2d, conic, opacity, feats):
    ids = bins.inst_gauss; valid = ids >= 0; safe = jnp.maximum(ids, 0)
    src = jnp.concatenate([mean2d, conic, opacity[:,None], feats], -1)
    if src.shape[1] < c_pad:
        src = jnp.pad(src, ((0,0),(0,c_pad-src.shape[1])))
    g = jnp.where(valid[:,None], jnp.take(src, safe, axis=0), 0.0)
    nb = g.shape[0]//128
    return jnp.pad(g.reshape(nb,128,c_pad).transpose(0,2,1), ((0,1),(0,0),(0,0)))

payload = jax.block_until_ready(jax.jit(build_payload)(screen.mean2d, screen.conic, screen.opacity, feats))

def timeit(name, f, *a, n=10):
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(*a)); t0=time.time()
    for _ in range(n): out = jf(*a)
    jax.block_until_ready(out); print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

# kernel-only grad
def kern_loss(payload):
    out = tile_blend_instances(payload, bins.block_start, bins.tile_count, F, gx, NT, TC, False)
    return jnp.sum(out)
timeit("kernel fwd+bwd", jax.grad(kern_loss), payload)

# payload build grad (gather transpose)
def build_loss(mean2d, conic, opacity, feats):
    p = build_payload(mean2d, conic, opacity, feats)
    return jnp.sum(p * p)
timeit("payload build fwd+bwd", jax.grad(build_loss, argnums=(0,1,2,3)), screen.mean2d, screen.conic, screen.opacity, feats)

# ssim grad at full res
img = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3))
gt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
timeit("ssim fwd", lambda a, b: L.ssim(a, b), img, gt)
timeit("ssim fwd+bwd", jax.grad(lambda a, b: L.ssim(a, b)), img, gt)

# preprocess grad
def pre_loss(params):
    s = prep(params)
    return jnp.sum(s.mean2d) + jnp.sum(s.conic) + jnp.sum(s.rgb)
timeit("compose+preprocess fwd+bwd", jax.grad(lambda p: pre_loss(p)), params)
