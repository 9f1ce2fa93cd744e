"""Torch checkpoint importer: reference state_dicts -> (params, state) pytrees.

Gives weight-level parity with the reference (experimental.py:247
`attempt_load` loads `ema` else `model`): upstream YOLOv7 `.pt` checkpoints
(and reference models instantiated in tests as oracles) import 1:1 into this
framework. Conv weights transpose OIHW -> HWIO; implicit knowledge (1,C,1,1)
buffers flatten to (C,).

Works from a flat `{name: numpy array}` state dict, so torch is only needed
by the caller that unpickles the checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models import attention as ATT
from yolo_series_tpu.models import extra as X
from yolo_series_tpu.models import layers as L
from yolo_series_tpu.models import heads as H
from yolo_series_tpu.models.graph import GraphPlan


def _t(w: np.ndarray) -> jnp.ndarray:
    """OIHW conv weight -> HWIO."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


class _SD:
    """Flat state-dict view with presence checks and consumption tracking."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used = set()

    def get(self, key: str) -> np.ndarray:
        self.used.add(key)
        # always copy: values often come from tensor.numpy() views that
        # SHARE memory with live torch tensors, and jnp.asarray on CPU can
        # zero-copy alias numpy buffers — an in-place optimizer step on the
        # torch side would then silently mutate the imported params
        return np.array(self.sd[key], copy=True)

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self):
        return [k for k in self.sd if k not in self.used
                and not k.endswith("num_batches_tracked")
                and not k.endswith("anchors") and not k.endswith("anchor_grid")]


def _import_bn(sd: _SD, prefix: str):
    params = {"scale": jnp.asarray(sd.get(f"{prefix}.weight")),
              "bias": jnp.asarray(sd.get(f"{prefix}.bias"))}
    state = {"mean": jnp.asarray(sd.get(f"{prefix}.running_mean")),
             "var": jnp.asarray(sd.get(f"{prefix}.running_var"))}
    return params, state


def _import_convbn(sd: _SD, prefix: str):
    """reference Conv (common.py:99): {conv.weight, bn.*}; fused: conv.bias."""
    w = _t(sd.get(f"{prefix}.conv.weight"))
    if sd.has(f"{prefix}.bn.weight"):
        bnp, bns = _import_bn(sd, f"{prefix}.bn")
        return {"w": w, "bn": bnp}, {"bn": bns}
    return {"w": w, "b": jnp.asarray(sd.get(f"{prefix}.conv.bias"))}, {}


def _import_repconv(sd: _SD, prefix: str, block: L.RepConv):
    if sd.has(f"{prefix}.rbr_reparam.weight"):
        return ({"w": _t(sd.get(f"{prefix}.rbr_reparam.weight")),
                 "b": jnp.asarray(sd.get(f"{prefix}.rbr_reparam.bias"))}, {})
    dp, ds = _import_bn(sd, f"{prefix}.rbr_dense.1")
    op, os_ = _import_bn(sd, f"{prefix}.rbr_1x1.1")
    params = {"dense": {"w": _t(sd.get(f"{prefix}.rbr_dense.0.weight")), "bn": dp},
              "one": {"w": _t(sd.get(f"{prefix}.rbr_1x1.0.weight")), "bn": op}}
    state = {"dense": {"bn": ds}, "one": {"bn": os_}}
    if block.has_identity:
        ip, is_ = _import_bn(sd, f"{prefix}.rbr_identity")
        params["idbn"] = ip
        state["idbn"] = is_
    return params, state


def _child_torch_name(block, name: str) -> str:
    """my child name -> torch attribute path under the block."""
    if isinstance(block, L.Ghost):
        return {"conv0": "conv.0", "conv1": "conv.1", "conv2": "conv.2",
                "short_dw": "shortcut.0", "short_pw": "shortcut.1"}[name]
    if name[0] == "m" and name[1:].isdigit():
        # STCSP*/ST2CSP* hold ONE SwinTransformer(2)Block named plain `m`
        # (common.py:1611, :1973), not an nn.Sequential
        if isinstance(block.children()[name], ATT.SwinTransformerBlock):
            return "m"
        return f"m.{name[1:]}"
    return name


def _lin(sd: _SD, prefix: str, bias: bool = True):
    """torch nn.Linear (out,in) -> {w:(in,out)[, b]}."""
    p = {"w": jnp.asarray(sd.get(f"{prefix}.weight").T)}
    if bias:
        p["b"] = jnp.asarray(sd.get(f"{prefix}.bias"))
    return p


def _import_window_attention(sd: _SD, prefix: str, blk: "ATT.WindowAttention"):
    sd.used.add(f"{prefix}.relative_position_index")  # fixed buffer
    p = {"proj": _lin(sd, f"{prefix}.proj")}
    if blk.v2:
        sd.used.add(f"{prefix}.relative_coords_table")
        # v2 packs q_bias/zero/v_bias next to a bias-free qkv weight
        # (common.py:1727-1731)
        qb = sd.get(f"{prefix}.q_bias")
        vb = sd.get(f"{prefix}.v_bias")
        p["qkv"] = {"w": jnp.asarray(sd.get(f"{prefix}.qkv.weight").T),
                    "b": jnp.asarray(np.concatenate(
                        [qb, np.zeros_like(qb), vb]))}
        p["logit_scale"] = jnp.asarray(sd.get(f"{prefix}.logit_scale"))
        p["cpb1"] = _lin(sd, f"{prefix}.cpb_mlp.0")
        p["cpb2"] = _lin(sd, f"{prefix}.cpb_mlp.2", bias=False)
    else:
        p["qkv"] = _lin(sd, f"{prefix}.qkv")
        p["rel_bias"] = jnp.asarray(
            sd.get(f"{prefix}.relative_position_bias_table"))
    return p


def _import_swin_layer(sd: _SD, prefix: str, blk: "ATT.SwinTransformerLayer"):
    p = {"norm1": {"scale": jnp.asarray(sd.get(f"{prefix}.norm1.weight")),
                   "bias": jnp.asarray(sd.get(f"{prefix}.norm1.bias"))},
         "norm2": {"scale": jnp.asarray(sd.get(f"{prefix}.norm2.weight")),
                   "bias": jnp.asarray(sd.get(f"{prefix}.norm2.bias"))},
         "attn": _import_window_attention(sd, f"{prefix}.attn", blk._attn()),
         "fc1": _lin(sd, f"{prefix}.mlp.fc1"),
         "fc2": _lin(sd, f"{prefix}.mlp.fc2")}
    return p


def _import_orepa3x3(sd: _SD, prefix: str, blk: "X.OREPA3x3"):
    for buf in ("weight_rbr_avg_avg", "weight_rbr_prior"):
        sd.used.add(f"{prefix}.{buf}")  # fixed buffers, regenerated here
    if sd.has(f"{prefix}.weight_rbr_1x1_kxk_idconv1"):
        # effective internal matrix = (idconv1 + id).squeeze() with layout
        # (t, i) (common.py:1184-1186); ours is its transpose (i, t)
        conv1 = (sd.get(f"{prefix}.weight_rbr_1x1_kxk_idconv1")
                 + sd.get(f"{prefix}.id_tensor")).squeeze(-1).squeeze(-1)
    else:
        conv1 = sd.get(f"{prefix}.weight_rbr_1x1_kxk_conv1").squeeze(-1).squeeze(-1)
    bnp, bns = _import_bn(sd, f"{prefix}.bn")
    p = {"origin": _t(sd.get(f"{prefix}.weight_rbr_origin")),
         "avg_conv": _t(sd.get(f"{prefix}.weight_rbr_avg_conv")),
         "pfir_conv": _t(sd.get(f"{prefix}.weight_rbr_pfir_conv")),
         "kxk_1x1": jnp.asarray(conv1.T)[None, None],
         "kxk_kxk": _t(sd.get(f"{prefix}.weight_rbr_1x1_kxk_conv2")),
         "dw": _t(sd.get(f"{prefix}.weight_rbr_gconv_dw")),
         "pw": _t(sd.get(f"{prefix}.weight_rbr_gconv_pw")),
         "vector": jnp.asarray(sd.get(f"{prefix}.vector")),
         "bn": bnp}
    return p, {"bn": bns}


def _import_repconv_orepa(sd: _SD, prefix: str, blk: "X.RepConvOREPA"):
    if sd.has(f"{prefix}.rbr_reparam.weight"):
        return ({"w": _t(sd.get(f"{prefix}.rbr_reparam.weight")),
                 "b": jnp.asarray(sd.get(f"{prefix}.rbr_reparam.bias"))}, {})
    dp, ds = _import_orepa3x3(sd, f"{prefix}.rbr_dense",
                              blk.children()["rbr_dense"])
    bnp1, bns1 = _import_bn(sd, f"{prefix}.rbr_1x1.bn")
    params = {"rbr_dense": dp,
              "rbr_1x1": {"w": _t(sd.get(f"{prefix}.rbr_1x1.conv.weight")),
                          "bn": bnp1}}
    state = {"rbr_dense": ds, "rbr_1x1": {"bn": bns1}}
    if blk.has_identity:
        idp, ids = _import_bn(sd, f"{prefix}.rbr_identity")
        params["idbn"], state["idbn"] = idp, ids
    return params, state


def _import_transformer_block(sd: _SD, prefix: str, blk: "ATT.TransformerBlock"):
    params, state = {}, {}
    if blk.c1 != blk.c2:
        params["conv"], state["conv"] = _import_convbn(sd, f"{prefix}.conv")
    params["pos"] = _lin(sd, f"{prefix}.linear")
    for i in range(blk.num_layers):
        t = f"{prefix}.tr.{i}"
        params[f"tr{i}"] = {
            "q": _lin(sd, f"{t}.q", bias=False),
            "k": _lin(sd, f"{t}.k", bias=False),
            "v": _lin(sd, f"{t}.v", bias=False),
            "in_proj": {"w": jnp.asarray(sd.get(f"{t}.ma.in_proj_weight").T),
                        "b": jnp.asarray(sd.get(f"{t}.ma.in_proj_bias"))},
            "out_proj": _lin(sd, f"{t}.ma.out_proj"),
            "fc1": _lin(sd, f"{t}.fc1", bias=False),
            "fc2": _lin(sd, f"{t}.fc2", bias=False),
        }
    return params, state


def import_block(block, sd: _SD, prefix: str) -> Tuple[Any, Any]:
    if isinstance(block, L.RepConv):
        return _import_repconv(sd, prefix, block)
    if isinstance(block, L.Focus):
        return _import_convbn(sd, f"{prefix}.conv")
    if isinstance(block, L.ConvBnAct):
        return _import_convbn(sd, prefix)
    if isinstance(block, X.RepConvOREPA):
        return _import_repconv_orepa(sd, prefix, block)
    if isinstance(block, X.OREPA3x3):
        return _import_orepa3x3(sd, prefix, block)
    if isinstance(block, ATT.SwinTransformerBlock):
        params, state = {}, {}
        if block.c1 != block.c2:
            params["conv"], state["conv"] = _import_convbn(sd, f"{prefix}.conv")
        for i in range(block.num_layers):
            layer = block.children()[f"m{i}"]
            params[f"m{i}"] = _import_swin_layer(sd, f"{prefix}.blocks.{i}", layer)
            state[f"m{i}"] = {}
        return params, state
    if isinstance(block, ATT.TransformerBlock):
        return _import_transformer_block(sd, prefix, block)
    if isinstance(block, X.RobustConv):
        params, state = {}, {}
        params["conv_dw"], state["conv_dw"] = _import_convbn(sd, f"{prefix}.conv_dw")
        params["conv1x1"] = {"w": _t(sd.get(f"{prefix}.conv1x1.weight")),
                             "b": jnp.asarray(sd.get(f"{prefix}.conv1x1.bias"))}
        if sd.has(f"{prefix}.gamma"):
            params["gamma"] = jnp.asarray(sd.get(f"{prefix}.gamma"))
        return params, state
    if isinstance(block, X.RobustConv2):
        params, state = {}, {}
        params["conv_strided"], state["conv_strided"] = _import_convbn(
            sd, f"{prefix}.conv_strided")
        # ConvTranspose2d weight is (in, out, kh, kw) and PLACES the kernel
        # (out[s*i+a] += x[i]*w[..,a,..]); jax conv_transpose correlates the
        # dilated input, which mirrors the kernel -> flip spatial axes.
        wt = sd.get(f"{prefix}.conv_deconv.weight")[:, :, ::-1, ::-1]
        params["deconv"] = {"w": jnp.asarray(np.ascontiguousarray(
                                wt.transpose(2, 3, 0, 1))),
                            "b": jnp.asarray(sd.get(f"{prefix}.conv_deconv.bias"))}
        if sd.has(f"{prefix}.gamma"):
            params["gamma"] = jnp.asarray(sd.get(f"{prefix}.gamma"))
        return params, state
    if isinstance(block, X.MixConv2d):
        bnp, bns = _import_bn(sd, f"{prefix}.bn")
        params = {f"m{i}": {"w": _t(sd.get(f"{prefix}.m.{i}.weight"))}
                  for i in range(len(block.k))}
        params["bn"] = bnp
        return params, {"bn": bns}
    if isinstance(block, X.Sum):
        if block.weight:
            return {"w": jnp.asarray(sd.get(f"{prefix}.w"))}, {}
        return {}, {}
    if isinstance(block, X.Classify):
        return ({"w": _t(sd.get(f"{prefix}.conv.weight")),
                 "b": jnp.asarray(sd.get(f"{prefix}.conv.bias"))}, {})
    if isinstance(block, L.PlainConv):
        return ({"w": _t(sd.get(f"{prefix}.weight")),
                 "b": jnp.asarray(sd.get(f"{prefix}.bias"))}, {})
    if isinstance(block, L.BatchNorm2d):
        return _import_bn(sd, prefix)
    if isinstance(block, (L.ImplicitA, L.ImplicitM)):
        return {"v": jnp.asarray(sd.get(f"{prefix}.implicit").reshape(-1))}, {}
    if isinstance(block, L.Composite):
        params, state = {}, {}
        for name, child in block.children().items():
            tname = _child_torch_name(block, name)
            params[name], state[name] = import_block(child, sd, f"{prefix}.{tname}")
        return params, state
    # stateless blocks (MP/SP/ReOrg/Concat/Upsample/...)
    return {}, {}


def _import_head(head, sd: _SD, prefix: str):
    params: Dict[str, Any] = {"m": []}
    fused_implicit = not sd.has(f"{prefix}.ia.0.implicit")
    for i in range(head.nl):
        params["m"].append({"w": _t(sd.get(f"{prefix}.m.{i}.weight")),
                            "b": jnp.asarray(sd.get(f"{prefix}.m.{i}.bias"))})
    if isinstance(head, H.IBin):
        # SigmoidBin buffers are fixed tables regenerated here
        for wh in ("w", "h"):
            sd.used.add(f"{prefix}.{wh}_bin_sigmoid.bins")
            sd.used.add(f"{prefix}.{wh}_bin_sigmoid.BCEbins.pos_weight")
    if isinstance(head, (H.IDetect, H.IAuxDetect, H.IKeypoint, H.IBin)) \
            and not fused_implicit:
        params["ia"] = [{"v": jnp.asarray(sd.get(f"{prefix}.ia.{i}.implicit").reshape(-1))}
                        for i in range(head.nl)]
        params["im"] = [{"v": jnp.asarray(sd.get(f"{prefix}.im.{i}.implicit").reshape(-1))}
                        for i in range(head.nl)]
    if isinstance(head, H.IAuxDetect) and sd.has(f"{prefix}.m2.0.weight"):
        params["m2"] = [{"w": _t(sd.get(f"{prefix}.m2.{i}.weight")),
                         "b": jnp.asarray(sd.get(f"{prefix}.m2.{i}.bias"))}
                        for i in range(head.nl)]
    if isinstance(head, H.IKeypoint):
        params["m_kpt"] = [{"w": _t(sd.get(f"{prefix}.m_kpt.{i}.weight")),
                            "b": jnp.asarray(sd.get(f"{prefix}.m_kpt.{i}.bias"))}
                           for i in range(head.nl)]
    return params, {}


def import_state_dict(plan: GraphPlan, state_dict: Dict[str, np.ndarray],
                      strict: bool = True):
    """Import a reference/upstream flat state dict (numpy values) into
    (params, state) for `plan`. Keys are 'model.{i}.<...>'."""
    sd = _SD(state_dict)
    params, state = [], []
    for spec in plan.layers:
        prefix = f"model.{spec.index}"
        if spec.is_head:
            p, s = _import_head(spec.block, sd, prefix)
        elif spec.n_seq > 1:
            ps, ss = zip(*[import_block(spec.block, sd, f"{prefix}.{r}")
                           for r in range(spec.n_seq)])
            p, s = list(ps), list(ss)
        else:
            p, s = import_block(spec.block, sd, prefix)
        params.append(p)
        state.append(s)
    if strict:
        leftover = sd.unused()
        if leftover:
            raise ValueError(f"unmatched torch keys: {leftover[:10]}"
                             f" (+{max(len(leftover)-10,0)} more)")
    return {"layers": params}, {"layers": state}


def load_torch_checkpoint(path: str, plan: GraphPlan, prefer_ema: bool = True):
    """Load a reference .pt checkpoint (full pickled module or state_dict).

    Mirrors attempt_load's `ema` preference (experimental.py:253).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        model = ckpt.get("ema") if prefer_ema and ckpt.get("ema") else ckpt.get("model", ckpt)
    else:
        model = ckpt
    if hasattr(model, "state_dict"):
        sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    else:
        sd = {k: np.asarray(v, dtype=np.float32) for k, v in model.items()}
    return import_state_dict(plan, sd)
