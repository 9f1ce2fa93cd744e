"""Train -> deploy re-parameterization as pure pytree weight transforms.

Capability parity with reference `Model.fuse()` (models/yolo.py:693-710):
  * Conv+BN fusion (torch_utils.fuse_conv_and_bn, torch_utils.py:181-201)
  * RepConv 3-branch collapse (common.py:509-552 get_equivalent_kernel_bias /
    common.py:584-643 fuse_repvgg_block)
  * IDetect implicit-knowledge folding (yolo.py:178-190): ia -> conv bias
    via matmul, im -> weight+bias scaling.

Because the model here is pure init/apply, fusion is a function
(params, state) -> (params', state') — numerically identical outputs, same
GraphPlan, fewer ops at inference. Verified fused == unfused in tests.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models import heads as H
from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models.layers import BN_EPS

if False:  # typing only — graph imports block modules, avoid the cycle
    from yolo_series_tpu.models.graph import GraphPlan


def fuse_conv_bn(w, bn_params, bn_state, eps=BN_EPS):
    """(HWIO weight, BN) -> (w', b') with identical inference output."""
    gamma, beta = bn_params["scale"], bn_params["bias"]
    mean, var = bn_state["mean"], bn_state["var"]
    scale = gamma / jnp.sqrt(var + eps)          # (O,)
    return w * scale, beta - mean * scale


def _bn_as_conv(c, g, bn_params, bn_state, eps=BN_EPS):
    """Identity 3x3 kernel through BN (RepConv identity branch,
    common.py:533-546)."""
    cin_per_group = c // g
    k = np.zeros((3, 3, cin_per_group, c), np.float32)
    for o in range(c):
        k[1, 1, o % cin_per_group, o] = 1.0
    return fuse_conv_bn(jnp.asarray(k), bn_params, bn_state, eps)


def fuse_repconv(block: L.RepConv, params, state):
    """RepConv train params -> single {w, b} 3x3 conv."""
    if "w" in params:  # already fused
        return params, {}
    w3, b3 = fuse_conv_bn(params["dense"]["w"], params["dense"]["bn"],
                          state["dense"]["bn"])
    w1, b1 = fuse_conv_bn(params["one"]["w"], params["one"]["bn"],
                          state["one"]["bn"])
    w1 = jnp.pad(w1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    w, b = w3 + w1, b3 + b1
    if block.has_identity:
        wi, bi = _bn_as_conv(block.c1, block.g, params["idbn"], state["idbn"])
        w, b = w + wi, b + bi
    return {"w": w, "b": b}, {}


def fuse_head_implicit(head, params):
    """Fold IDetect/IAuxDetect ia/im into the 1x1 convs (yolo.py:178-190)."""
    if "ia" not in params:
        return params
    new = dict(params)
    ms = []
    for i, mp in enumerate(params["m"]):
        w, b = mp["w"], mp["b"]           # w: (1, 1, C, O)
        ia = params["ia"][i]["v"]          # (C,)
        im = params["im"][i]["v"]          # (O,)
        b = b + jnp.einsum("c,c o -> o", ia, w[0, 0])
        w = w * im
        b = b * im
        ms.append({"w": w, "b": b})
    new["m"] = ms
    new.pop("ia")
    new.pop("im")
    if "m2" in params:  # IAuxDetect aux convs have no implicit layers
        new["m2"] = params["m2"]
    return new


def fuse_block(block, params, state) -> Tuple[Any, Any]:
    if isinstance(block, L.RepConv):
        return fuse_repconv(block, params, state)
    if hasattr(block, "deploy") and "w" not in params:
        # OREPA family: weight_gen + BN collapse (common.py:1323-1345)
        return block.deploy(params, state)
    if isinstance(block, (L.ConvBnAct, L.Focus)):
        if "bn" in params:
            w, b = fuse_conv_bn(params["w"], params["bn"], state["bn"])
            return {"w": w, "b": b}, {}
        return params, state
    if isinstance(block, L.Composite):
        kids = block.children()
        new_p, new_s = {}, {}
        for name, child in kids.items():
            new_p[name], new_s[name] = fuse_block(child, params[name], state[name])
        return new_p, new_s
    return params, state


def fuse_model(plan: "GraphPlan", params, state) -> Tuple[Any, Any]:
    """Full train->deploy fusion (the reference attempt_load always fuses,
    experimental.py:253)."""
    lp, ls = params["layers"], state["layers"]
    new_p, new_s = [], []
    for idx, spec in enumerate(plan.layers):
        if spec.is_head:
            new_p.append(fuse_head_implicit(spec.block, lp[idx]))
            new_s.append(ls[idx])
        elif spec.n_seq > 1:
            ps, ss = zip(*[fuse_block(spec.block, lp[idx][r], ls[idx][r])
                           for r in range(spec.n_seq)])
            new_p.append(list(ps))
            new_s.append(list(ss))
        else:
            p, s = fuse_block(spec.block, lp[idx], ls[idx])
            new_p.append(p)
            new_s.append(s)
    return {"layers": new_p}, {"layers": new_s}


def prune_model(params, amount: float = 0.3):
    """Per-leaf L1 unstructured pruning of conv kernels (reference
    torch_utils.prune, :228-236: l1_unstructured per Conv2d module).
    Zeroes the smallest-|w| `amount` fraction of every conv kernel leaf;
    the zeros persist through deploy transforms and quantization."""

    def prune_leaf(path, leaf):
        name = ""
        for p in reversed(path):
            k = getattr(p, "key", None)
            if isinstance(k, str):
                name = k
                break
        if name == "w" and getattr(leaf, "ndim", 0) == 4:
            flat = np.abs(np.asarray(leaf)).ravel()
            k = int(len(flat) * amount)
            if k == 0:
                return leaf
            thr = np.partition(flat, k - 1)[k - 1]
            return jnp.where(jnp.abs(leaf) <= thr, 0.0, leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(prune_leaf, params)


def sparsity(params) -> float:
    """Global fraction of zero weights (reference torch_utils.sparsity)."""

    zeros = total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        a = np.asarray(leaf)
        zeros += int((a == 0).sum())
        total += a.size
    return zeros / max(total, 1)
