import time, functools
import jax, jax.numpy as jnp, numpy as np
from street_gaussians_tpu.data.synthetic import make_synthetic_scene
from street_gaussians_tpu.models.renderer import RenderOptions, SceneParams, compose_frame
from street_gaussians_tpu.ops.preprocess import preprocess_gaussians, TILE
from street_gaussians_tpu.ops.binning import _fill_forward

H, W = 880, 1280
IC = 2**21
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
n = screen.depth.shape[0]

def timeit(name, f, *a, n_=10):
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(*a)); t0=time.time()
    for _ in range(n_): out = jf(*a)
    jax.block_until_ready(out); print(f"{name}: {(time.time()-t0)/n_*1000:.1f} ms", flush=True)

def p1(screen):
    sort_depth = jnp.where(screen.valid, screen.depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)
    src = jnp.stack([screen.tiles_touched, screen.rect_min[:,0], screen.rect_min[:,1],
                     screen.rect_max[:,0]-screen.rect_min[:,0]], axis=1)
    srt = jnp.take(src, order, axis=0)
    cnt = srt[:,0]; offs = jnp.cumsum(cnt) - cnt
    return order, cnt, offs, srt
timeit("q1 sort+rowgather", p1, screen)

def p2(screen):
    order, cnt, offs, srt = p1(screen)
    ff = functools.partial(_fill_forward, offs=offs, cnt=cnt, instance_capacity=IC)
    return ff(offs), ff(srt[:,1]), ff(srt[:,2]), ff(srt[:,3]), ff(order.astype(jnp.int32))
timeit("q2 +5 fill-forwards", p2, screen)

def p3(screen):
    order, cnt, offs, srt = p1(screen)
    ff = functools.partial(_fill_forward, offs=offs, cnt=cnt, instance_capacity=IC)
    offs_i, rx, ry, rw, gi = ff(offs), ff(srt[:,1]), ff(srt[:,2]), jnp.maximum(ff(srt[:,3]),1), ff(order.astype(jnp.int32))
    s = jnp.arange(IC, dtype=jnp.int32)
    started = jnp.cumsum(jnp.zeros((IC,), jnp.int32).at[jnp.where(cnt>0, offs, IC)].add(1, mode="drop"))
    total = offs[-1] + cnt[-1]
    iv = (s < total) & (started > 0)
    k = s - offs_i
    tile_id = jnp.where(iv, (ry + k // rw) * gx + rx + k % rw, NT).astype(jnp.int32)
    gauss_id = jnp.where(iv, gi, -1).astype(jnp.int32)
    return tile_id, gauss_id, iv
timeit("q3 +instance calc", p3, screen)

def p4(screen):
    tile_id, gauss_id, iv = p3(screen)
    counts = jax.ops.segment_sum(iv.astype(jnp.int32), tile_id, num_segments=NT+1)[:NT]
    return counts, tile_id, gauss_id
timeit("q4 +segment_sum", p4, screen)

def p5(screen):
    counts, tile_id, gauss_id = p4(screen)
    st, sg = jax.lax.sort((tile_id, gauss_id), num_keys=1, is_stable=True)
    return st, sg, counts
timeit("q5 +pair sort", p5, screen)

def p5b(screen):
    counts, tile_id, gauss_id = p4(screen)
    tile_id = jax.lax.optimization_barrier(tile_id)
    gauss_id = jax.lax.optimization_barrier(gauss_id)
    st, sg = jax.lax.sort((tile_id, gauss_id), num_keys=1, is_stable=True)
    return st, sg, counts
timeit("q5b +pair sort (barrier)", p5b, screen)

def p6(screen):
    st, sg, counts = p5(screen)
    clamped = jnp.minimum(counts, 1024)
    blocks = (clamped + 127)//128
    bs = (jnp.cumsum(blocks) - blocks).astype(jnp.int32)
    tile_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    safe = jnp.clip(st, 0, NT-1)
    rank = jnp.arange(IC, dtype=jnp.int32) - tile_start[safe]
    keep = (st < NT) & (rank < clamped[safe])
    S_pad = IC + 128*NT
    dest = jnp.where(keep, bs[safe]*128 + rank, S_pad)
    ig = jnp.full((S_pad,), -1, jnp.int32).at[dest].set(jnp.where(keep, sg, -1), mode="drop")
    return ig, clamped, bs
timeit("q6 +ranks/scatter (full bin)", p6, screen)
