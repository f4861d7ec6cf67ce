from street_gaussians_tpu.optim.adam import AdamState, adam_init, adam_update  # noqa: F401
from street_gaussians_tpu.optim.schedule import expon_lr  # noqa: F401
