"""Optimizer: 3-group SGD (nesterov) / Adam with YOLO warmup semantics.

Mirrors the reference's parameter grouping (train.py:115-187):
  pg0 — BN scales/biases + implicit knowledge + other 1-D "norm-ish"
        params: no weight decay
  pg1 — conv/linear weights: weight decay
  pg2 — biases: no weight decay, and a separate warmup ramp that starts at
        warmup_bias_lr and descends to lr (train.py:349-357)

Implemented as a hand-rolled momentum update over pytrees with static
group masks (torch-SGD semantics incl. nesterov: d = g + wd*p;
v = mu*v + d; step = d + mu*v), because the per-group lr/momentum are
*traced scalars* that change every step during warmup.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    kind: str = "sgd"        # 'sgd' | 'adam'
    lr0: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 0.0005
    nesterov: bool = True
    adam_b2: float = 0.999


GROUP_DECAY = 1    # conv weights
GROUP_NODECAY = 0  # bn / implicit / 1-D params
GROUP_BIAS = 2     # biases


def param_groups(params: Any) -> Any:
    """Static group-id pytree matching `params`.

    Rules (matching the reference's module walk, train.py:115-187):
      * every leaf named 'b' or 'bias' -> bias group pg2 (the reference's
        `hasattr(v, 'bias')` walk collects ALL module biases, including
        BatchNorm's — they get the warmup_bias_lr ramp, train.py:117-118)
      * leaf named 'w' with ndim >= 2 (conv/linear kernels) -> decay pg1
      * everything else (BN scale, implicit knowledge, OREPA branch
        weights/vector, attention logit_scale/rel_bias, 1-D) -> pg0
        no-decay, matching the reference's explicit pg0 appends
        (train.py:119-176)
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    groups = []
    for path, leaf in flat:
        name = ""
        for p in reversed(path):
            k = getattr(p, "key", None)
            if isinstance(k, str):
                name = k
                break
        if name in ("b", "bias"):
            groups.append(GROUP_BIAS)
        elif name == "w" and leaf.ndim >= 2:
            groups.append(GROUP_DECAY)
        else:
            groups.append(GROUP_NODECAY)
    return jax.tree_util.tree_unflatten(treedef, groups)


def make_optimizer(cfg: OptimConfig, params: Any):
    """Returns (init_fn, update_fn).

    update_fn(opt_state, params, grads, lr_groups, momentum) -> (new_params,
    new_opt_state). `lr_groups` is a (3,) array of per-group learning rates
    (warmup makes them differ); momentum is a traced scalar.
    """
    groups = param_groups(params)

    def init(params):
        mom = jax.tree_util.tree_map(jnp.zeros_like, params)
        if cfg.kind == "adam":
            nu = jax.tree_util.tree_map(jnp.zeros_like, params)
            return {"m": mom, "v": nu, "t": jnp.zeros((), jnp.int32)}
        return {"v": mom}

    def update(opt_state, params, grads, lr_groups, momentum):
        if cfg.kind == "adam":
            t = opt_state["t"] + 1
            b1, b2 = momentum, cfg.adam_b2

            def upd(g, p, m, v, gid):
                wd = cfg.weight_decay if gid == GROUP_DECAY else 0.0
                g = g + wd * p
                m2 = b1 * m + (1 - b1) * g
                v2 = b2 * v + (1 - b2) * jnp.square(g)
                mhat = m2 / (1 - b1**t)
                vhat = v2 / (1 - b2**t)
                lr = lr_groups[gid]
                return p - lr * mhat / (jnp.sqrt(vhat) + 1e-8), m2, v2

            out = jax.tree_util.tree_map(upd, grads, params,
                                         opt_state["m"], opt_state["v"], groups)
            new_p = jax.tree_util.tree_map(lambda o: o[0], out,
                                           is_leaf=lambda x: isinstance(x, tuple))
            new_m = jax.tree_util.tree_map(lambda o: o[1], out,
                                           is_leaf=lambda x: isinstance(x, tuple))
            new_v = jax.tree_util.tree_map(lambda o: o[2], out,
                                           is_leaf=lambda x: isinstance(x, tuple))
            return new_p, {"m": new_m, "v": new_v, "t": t}

        def upd(g, p, v, gid):
            wd = cfg.weight_decay if gid == GROUP_DECAY else 0.0
            d = g + wd * p
            v2 = momentum * v + d
            step = d + momentum * v2 if cfg.nesterov else v2
            lr = lr_groups[gid]
            return p - lr * step, v2

        out = jax.tree_util.tree_map(upd, grads, params, opt_state["v"], groups)
        new_p = jax.tree_util.tree_map(lambda o: o[0], out,
                                       is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree_util.tree_map(lambda o: o[1], out,
                                       is_leaf=lambda x: isinstance(x, tuple))
        return new_p, {"v": new_v}

    return init, update
