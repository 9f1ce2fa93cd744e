"""Model EMA as a pytree lerp (reference torch_utils.py:269-303 ModelEMA).

decay(t) = base * (1 - exp(-t / 2000)) — the reference's warm ramp so early
updates move the EMA faster. Applied to params AND BN running stats (the
reference copies the full module, stats included).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(updates, base=0.9999, tau=2000.0):
    return base * (1.0 - jnp.exp(-updates / tau))


def ema_update(ema_tree, new_tree, updates, base=0.9999, tau=2000.0):
    d = ema_decay(updates, base, tau)
    return jax.tree_util.tree_map(
        lambda e, p: (e * d + (1.0 - d) * p).astype(e.dtype)
        if jnp.issubdtype(e.dtype, jnp.floating) else p,
        ema_tree, new_tree)
