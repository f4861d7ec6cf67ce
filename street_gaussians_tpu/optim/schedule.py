"""Learning-rate schedules, pure jnp (jit-safe, step is a traced scalar).

The exponential log-lerp schedule with delayed warmup replicates the
reference's Plenoxels-derived `get_expon_lr_func`
(ref: lib/utils/general_utils.py:53-86).
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
    warmup_steps: int = 0,
):
    """Log-linear interpolation from lr_init to lr_final over max_steps.

    Returns 0 before `warmup_steps` (used by the actor-pose residuals,
    which stay frozen until the first opacity reset,
    ref: lib/models/actor_pose.py:55-66) and 0 when both endpoints are 0.
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < warmup_steps, 0.0, lr)
