"""CLI: train a scene (ref analog: train.py at the reference root).

Usage: python train.py --config configs/example/waymo_train_002.yaml [KEY VALUE ...]
"""

from street_gaussians_tpu.config import config_from_args, make_argparser

if __name__ == "__main__":
    args = make_argparser("street_gaussians_tpu trainer").parse_args()
    cfg = config_from_args(args)
    cfg.mode = "train"
    if cfg.train.get("multihost", False):
        # jax.distributed.initialize() must run before any backend is
        # created; importing the runner (or parallel.dp) builds jnp
        # constants, which already initializes one — so initialize
        # FIRST and import the training machinery only after.
        import jax

        try:
            jax.distributed.initialize()
        except Exception as exc:  # single-host / no coordinator env
            print(f"[multihost] distributed init skipped: {exc}")

    from street_gaussians_tpu.runner import training

    training(cfg)
