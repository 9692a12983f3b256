"""Learning-rate schedules matching the reference semantics
(sings/rec/utils/general.py:76-126). Pure functions of the step so they
can run inside jit (the reference computes them host-side per step).
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear interpolation from lr_init to lr_final with optional
    sine-eased delay (Plenoxels-style)."""
    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return jnp.where(step < 0, 0.0, delay_rate * log_lerp)
    return helper


def cosine_lr(lr_init, lr_final, lr_delay_steps, t_max):
    """Cosine annealing after a constant delay window."""
    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        after = step - lr_delay_steps
        span = t_max - lr_delay_steps
        cosine = jnp.cos(jnp.pi * after / span)
        lr = lr_final + 0.5 * (lr_init - lr_final) * (1 + cosine)
        return jnp.where(step < lr_delay_steps, lr_init, lr)
    return helper


def constant_lr(lr):
    def helper(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), lr)
    return helper
