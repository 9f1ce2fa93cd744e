"""LR schedules + warmup interpolation (reference train.py:192-196, 349-357)."""

from __future__ import annotations

import math

import jax.numpy as jnp


def one_cycle_lr(epoch, epochs, lrf):
    """Cosine one-cycle factor 1 -> lrf (reference general.py one_cycle,
    train.py:193)."""
    return ((1 - jnp.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1


def linear_lr(epoch, epochs, lrf):
    """Linear factor 1 -> lrf (reference train.py:196)."""
    return (1 - epoch / (epochs - 1)) * (1.0 - lrf) + lrf


def warmup_accumulate(ni, warmup_steps, final):
    """Grad-accumulation ramp during warmup (reference train.py:352-353):
    ``accumulate = max(1, np.interp(ni, [0, nw], [1, nbs/bs]).round())``.

    Host-side (it picks which compiled step program runs); uses np.interp
    so rounding at .5 boundaries is bit-identical to the reference.
    """
    import numpy as np
    # np.interp clamps beyond nw, so post-warmup this stays at round(final)
    # like the reference (which stops updating accumulate once ni > nw)
    return max(1, int(np.interp(ni, [0, warmup_steps], [1, final]).round()))


def warmup_factors(step, warmup_steps, epoch_frac, epochs, lr0, lrf,
                   warmup_bias_lr, warmup_momentum, momentum,
                   cosine=True):
    """Per-group learning rates + momentum during/after warmup.

    Mirrors reference train.py:349-357: within warmup, groups 0/1 ramp
    0 -> lr*schedule, the bias group ramps warmup_bias_lr -> lr*schedule,
    and momentum ramps warmup_momentum -> momentum. Returns (lr_groups(3,),
    momentum_t).
    """
    sched = one_cycle_lr(epoch_frac, epochs, lrf) if cosine else \
        linear_lr(epoch_frac, epochs, lrf)
    target = lr0 * sched
    t = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)
    in_warm = step < warmup_steps
    lr_main = jnp.where(in_warm, t * target, target)
    lr_bias = jnp.where(in_warm, warmup_bias_lr + t * (target - warmup_bias_lr),
                        target)
    mom = jnp.where(in_warm, warmup_momentum + t * (momentum - warmup_momentum),
                    momentum)
    lr_groups = jnp.stack([lr_main, lr_main, lr_bias])
    return lr_groups, mom
