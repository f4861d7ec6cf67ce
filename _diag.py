import jax, jax.numpy as jnp, numpy as np
from street_gaussians_tpu.config import load_config, derive_paths
from street_gaussians_tpu.data.dataset import load_waymo_scene, load_ground_truth
from street_gaussians_tpu import train_lib
from street_gaussians_tpu.runner import build_initial_params, render_opts_from_cfg
from street_gaussians_tpu.models.renderer import render_frame

cfg = load_config('/tmp/demo_cfg.yaml')
cfg.model_path = '/tmp/demo_diag'; derive_paths(cfg); cfg.resume = False
scene = load_waymo_scene(cfg)
params = build_initial_params(cfg, scene)
state = train_lib.init_train_state(params, scene.aux_init)
opts = render_opts_from_cfg(cfg, 'train')

# manual grad probe on one camera
v = scene.train_views[0]
gt = load_ground_truth(v)
C = scene.table.capacity

def loss_fn(params):
    out = render_frame(params, state.aux, scene.table, scene.pose_data, v.frame_input,
                       jnp.asarray(100), key=jax.random.PRNGKey(0), opts=opts)
    l1 = jnp.abs(out['rgb'] - gt.image).mean()
    return l1, out

(l1, out), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(state.params)
print('l1', float(l1))
print('acc mean', float(out['acc'].mean()), 'rgb mean', float(out['rgb'].mean()), 'gt mean', float(gt.image.mean()))
print('overflow', int(out['overflow']), 'num_instances', int(out['num_instances']))
g = grads.gaussians
for n in ('xyz','feat_dc','log_scale','opacity_logit','rot'):
    arr = getattr(g, n)
    print('grad', n, float(jnp.abs(arr).max()), float(jnp.linalg.norm(arr.reshape(-1))))
print('grad sky', float(jnp.abs(grads.sky.cubemap).max()) if grads.sky is not None else None)

# now run 30 real train steps and check param motion + loss trend
step_fn = train_lib.make_train_step(cfg, scene.table, scene.pose_data, opts, donate=False)
key = jax.random.PRNGKey(0)
p0 = state.params.gaussians.feat_dc
for i in range(30):
    key, sub = jax.random.split(key)
    state, sc = step_fn(state, scene.train_views[i % len(scene.train_views)].frame_input,
                        load_ground_truth(scene.train_views[i % len(scene.train_views)]), sub)
    if i % 10 == 0:
        print('it', i, 'loss', float(sc['loss']), 'psnr', float(sc['psnr']))
print('feat_dc moved', float(jnp.abs(state.params.gaussians.feat_dc - p0).max()))
print('final psnr', float(sc['psnr']))
