"""CLI: train a scene (ref analog: train.py at the reference root).

Usage: python train.py --config configs/example/waymo_train_002.yaml [KEY VALUE ...]
"""

from street_gaussians_tpu.config import config_from_args, make_argparser
from street_gaussians_tpu.runner import training

if __name__ == "__main__":
    args = make_argparser("street_gaussians_tpu trainer").parse_args()
    cfg = config_from_args(args)
    cfg.mode = "train"
    if cfg.train.get("multihost", False):
        # must run before any other jax API touches devices
        from street_gaussians_tpu.parallel.dp import init_multihost

        init_multihost()
    training(cfg)
