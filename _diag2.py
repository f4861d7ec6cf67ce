import jax, jax.numpy as jnp, numpy as np
from street_gaussians_tpu.config import load_config, derive_paths
from street_gaussians_tpu.data.dataset import load_waymo_scene, load_ground_truth
from street_gaussians_tpu import train_lib
from street_gaussians_tpu.runner import build_initial_params, render_opts_from_cfg

cfg = load_config('/tmp/demo_cfg.yaml')
cfg.model_path = '/tmp/demo_diag2'; derive_paths(cfg); cfg.resume = False
scene = load_waymo_scene(cfg)
params = build_initial_params(cfg, scene)
state = train_lib.init_train_state(params, scene.aux_init)
opts = render_opts_from_cfg(cfg, 'train')
step_fn = train_lib.make_train_step(cfg, scene.table, scene.pose_data, opts, donate=False)
key = jax.random.PRNGKey(0)
gts = [load_ground_truth(v) for v in scene.train_views]
for i in range(16):
    key, sub = jax.random.split(key)
    state, sc = step_fn(state, scene.train_views[i % 8].frame_input, gts[i % 8], sub)
    print(i, {k: round(float(v), 4) for k, v in sc.items()}, flush=True)
