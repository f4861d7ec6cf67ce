"""Stage-by-stage timing of the rasterization pipeline at bench scale."""
import time
import jax, jax.numpy as jnp, numpy as np
from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models.renderer import RenderOptions, SceneParams, compose_frame, render_frame
from street_gaussians_tpu.models.sky_cubemap import init_sky, render_sky
from street_gaussians_tpu.ops import binning as binning_lib
from street_gaussians_tpu.ops.preprocess import preprocess_gaussians, TILE
from street_gaussians_tpu.ops.rasterize import RasterizeConfig, rasterize

H, W = 880, 1280
scene = make_synthetic_scene(num_bkgd=150_000, num_actors=4, H=H, W=W,
                             background_growth=3.0, actor_growth=3.0)
params = SceneParams(scene.params_init, scene.pose_params_init,
                     init_sky(1024, False), None, None)
opts = RenderOptions(mode="eval", tile_capacity=1024, instance_capacity=2**21)
frame = scene.frames[2]
cam = frame.cam
table = scene.table
grid_x = (W + TILE - 1) // TILE
grid_y = (H + TILE - 1) // TILE

def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms")
    return out

@jax.jit
def f_compose(params):
    return compose_frame(params, scene.aux, table, scene.pose_data, frame, jnp.asarray(10**9), opts=opts)

composed = timeit("compose", f_compose, params)

@jax.jit
def f_pre(params):
    c = compose_frame(params, scene.aux, table, scene.pose_data, frame, jnp.asarray(10**9), opts=opts)
    return preprocess_gaussians(
        c["means3d"], c["scales"], c["quats"], c["opacity"], c["shs"],
        cam.w2c, cam.full_proj, cam.cam_center, cam.H, cam.W,
        cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy,
        sh_degree=3, alive=c["visible"])

screen = timeit("compose+preprocess", f_pre, params)

@jax.jit
def f_bin(params):
    s = f_pre(params)
    return binning_lib.bin_gaussians(s, grid_x, grid_y, opts.instance_capacity, opts.tile_capacity)

bins = timeit("compose+pre+binning", f_bin, params)
print("num_instances", int(bins.num_instances), "overflow", int(bins.overflow))
tc = np.asarray(bins.tile_count)
print("tile_count: mean", tc.mean(), "p50", np.percentile(tc,50), "p95", np.percentile(tc,95), "max", tc.max())

@jax.jit
def f_full(params):
    s = f_pre(params)
    return rasterize(s, cam.H, cam.W, jnp.zeros(3), config=RasterizeConfig(opts.tile_capacity, opts.instance_capacity))

out = timeit("full rasterize", f_full, params)

@jax.jit
def f_sky(params):
    return render_sky(params.sky, cam)

timeit("sky", f_sky, params)

@jax.jit
def f_render(params):
    return render_frame(params, scene.aux, table, scene.pose_data, frame, jnp.asarray(10**9), opts=opts)["rgb"]

timeit("render_frame total", f_render, params)
