"""CLI: render train/test splits from a checkpoint with FPS measurement
(ref analog: render.py:15-96 at the reference root)."""

from street_gaussians_tpu.config import config_from_args, make_argparser
from street_gaussians_tpu.runner import render_sets

if __name__ == "__main__":
    args = make_argparser("street_gaussians_tpu renderer").parse_args()
    cfg = config_from_args(args)
    cfg.mode = "evaluate"
    render_sets(cfg)
