"""CLI: render from a checkpoint (ref analog: render.py:87-96 —
mode 'evaluate' renders train/test splits with FPS measurement,
mode 'trajectory' emits composite/background/object/depth videos)."""

from street_gaussians_tpu.config import config_from_args, make_argparser
from street_gaussians_tpu.runner import render_sets, render_trajectory

if __name__ == "__main__":
    args = make_argparser("street_gaussians_tpu renderer").parse_args()
    cfg = config_from_args(args)
    mode = cfg.mode if cfg.mode in ("evaluate", "trajectory") else "evaluate"
    cfg.mode = "evaluate"
    if mode == "trajectory":
        render_trajectory(cfg)
    else:
        render_sets(cfg)
