"""Model: pure init/apply over a compiled GraphPlan.

The reference's `Model.forward_once` module-interpreter loop
(models/yolo.py:601-631) becomes a Python loop *traced once* under jit —
the whole forward collapses into a single XLA computation and the
save-list routing becomes ordinary SSA values (SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_series_tpu.models.graph import GraphPlan, LayerSpec, compile_graph
from yolo_series_tpu.models.layers import Ctx


def init_model(plan: GraphPlan, key) -> Tuple[Any, Any]:
    """Initialize (params, state) pytrees for a plan; applies the detect-head
    bias priors (reference yolo.py:540 -> _initialize_biases)."""
    params: List[Any] = []
    state: List[Any] = []
    keys = jax.random.split(key, len(plan.layers))
    for spec, k in zip(plan.layers, keys):
        if spec.n_seq > 1:
            ks = jax.random.split(k, spec.n_seq)
            ps, ss = zip(*[spec.block.init(kk) for kk in ks])
            params.append(list(ps))
            state.append(list(ss))
        else:
            p, s = spec.block.init(k)
            params.append(p)
            state.append(s)
    head_spec = plan.layers[-1]
    params[-1] = head_spec.block.init_biases(params[-1])
    return {"layers": params}, {"layers": state}


def _run_layer(ctx, spec, p, s, inp, observer, idx):
    """One interpreter-loop body step (non-head): returns (y, new_state)."""
    if spec.n_seq > 1:
        outs = []
        cur = inp
        for r in range(spec.n_seq):
            c = (dataclasses.replace(ctx, path=f"l{idx}.{r}")
                 if observer is not None else ctx)
            cur, s_r = spec.block.apply(p[r], s[r], cur, c)
            outs.append(s_r)
        return cur, outs
    c = (dataclasses.replace(ctx, path=f"l{idx}")
         if observer is not None else ctx)
    return spec.block.apply(p, s, inp, c)


def apply_model(plan: GraphPlan, params, state, x, *,
                training: bool = False, axis_name: Optional[str] = None,
                dtype=jnp.float32, observer=None,
                return_head_inputs: bool = False, bn_shards: int = 1,
                remat_prefix: int = 0):
    """Run the graph. x: (B, H, W, C) NHWC in [0, 1].

    Returns (out, new_state) where out is the head's dict:
      training:  {"raw": [per-level (B, na, ny, nx, no)]}
      inference: {"pred": (B, A, no), "raw": [...]}

    observer(path, x) — eager-only hook fired at every conv input with
    paths matching infer/quant.quantize_tree ("l3", "l5/cv1", "l7.0", ...);
    used for int8 activation-scale calibration. Do not use under jit.
    """
    ctx = Ctx(training=training, axis_name=axis_name, dtype=dtype,
              observer=observer, bn_shards=bn_shards)
    lp = params["layers"]
    ls = state["layers"]
    new_state: List[Any] = list(ls)
    saved: Dict[int, jnp.ndarray] = {}
    y = x.astype(dtype)

    start = 0
    if remat_prefix > 0:
        # rematerialized stem (MFU lever, VERDICT r3 item 3): the first
        # `remat_prefix` layers run under jax.checkpoint, so the backward
        # pass RECOMPUTES their hi-res activations (640px x 32/64ch, the
        # HBM-bound dW/dX floor in the step profile) from the tiny input
        # image instead of re-reading them from HBM — FLOPs for bandwidth.
        assert observer is None, "remat_prefix is jit-only (no observer)"
        k = min(remat_prefix, len(plan.layers) - 1)
        save_out = sorted(i for i in plan.save if i < k)

        def prefix_fn(lp_k, ls_k, xin):
            yv = xin
            sv = {}
            ns = []
            for idx in range(k):
                spec = plan.layers[idx]
                if isinstance(spec.frm, tuple):
                    inp = [yv if j == -1 else sv[j] for j in spec.frm]
                else:
                    inp = yv if spec.frm == -1 else sv[spec.frm]
                yv, s_new = _run_layer(ctx, spec, lp_k[idx], ls_k[idx], inp,
                                       None, idx)
                ns.append(s_new)
                if idx in plan.save:
                    sv[idx] = yv
            # saved entries consumed PAST the prefix become checkpoint
            # outputs (kept, not recomputed)
            return yv, [sv[i] for i in save_out], ns

        y, saved_list, ns_prefix = jax.checkpoint(prefix_fn)(
            [lp[i] for i in range(k)], [ls[i] for i in range(k)], y)
        for i, idx in enumerate(save_out):
            saved[idx] = saved_list[i]
        for idx in range(k):
            new_state[idx] = ns_prefix[idx]
        start = k

    for idx in range(start, len(plan.layers)):
        spec = plan.layers[idx]
        if isinstance(spec.frm, tuple):
            inp = [y if j == -1 else saved[j] for j in spec.frm]
        else:
            inp = y if spec.frm == -1 else saved[spec.frm]

        if spec.is_head:
            if return_head_inputs:
                # serving fast path: the caller fuses head conv + candidate
                # selection + decode (ops/nms.fused_head_nms), skipping the
                # full (B, A, no) decode materialization and its transposes
                return inp, {"layers": new_state}
            out, new_state[idx] = spec.block.apply(lp[idx], ls[idx], inp, ctx)
            return out, {"layers": new_state}

        y, new_state[idx] = _run_layer(ctx, spec, lp[idx], ls[idx], inp,
                                       observer, idx)

        if idx in plan.save:
            saved[idx] = y

    raise ValueError("graph plan ended without a head layer")


def profile_layers(plan: GraphPlan, params, state, x, *, iters: int = 10,
                   dtype=jnp.float32, printout: bool = True):
    """Per-layer forward profile — the reference
    `Model.forward_once(profile=True)` (yolo.py:614-623: 10x per-module
    timing + thop GFLOPs + param count, printed as a table).

    Each layer runs as its OWN jitted program so its cost is attributable;
    timing fetches a small output slice (relay-safe, see bench.py). Note
    the full-model jit fuses across layers, so the per-layer sum is an
    upper bound on the fused forward — same caveat as the reference's
    eager per-module times vs its traced model.

    Returns a list of {idx, module, ms, gflops, params, shape} dicts.
    """
    import time

    ctx = Ctx(training=False, dtype=dtype)
    lp, ls = params["layers"], state["layers"]
    saved: Dict[int, jnp.ndarray] = {}
    y = x.astype(dtype)
    rows = []

    def layer_fn(spec):
        def fn(p, s, inp):
            if spec.n_seq > 1:
                cur = inp
                for r in range(spec.n_seq):
                    cur, _ = spec.block.apply(p[r], s[r], cur, ctx)
                return cur
            return spec.block.apply(p, s, inp, ctx)[0]
        return jax.jit(fn)

    for idx, spec in enumerate(plan.layers):
        if isinstance(spec.frm, tuple):
            inp = [y if j == -1 else saved[j] for j in spec.frm]
        else:
            inp = y if spec.frm == -1 else saved[spec.frm]

        fn = layer_fn(spec)
        # compile ONCE via AOT and reuse the executable for both the timed
        # runs and cost_analysis (fn.lower().compile() does not populate
        # the jit dispatch cache, so calling fn() after it would compile a
        # second time — expensive through the relayed TPU)
        ca = None
        try:
            run = fn.lower(lp[idx], ls[idx], inp).compile()
            ca = run.cost_analysis()
        except Exception:  # noqa: BLE001 — backend without AOT lowering
            run = fn
        out = run(lp[idx], ls[idx], inp)
        probe = out["pred"] if isinstance(out, dict) else out
        _ = np.asarray(probe[(0,) * (probe.ndim - 1)])  # warm + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(lp[idx], ls[idx], inp)
        probe = out["pred"] if isinstance(out, dict) else out
        _ = np.asarray(probe[(0,) * (probe.ndim - 1)])
        dt = (time.perf_counter() - t0) / iters * 1e3

        gflops = None
        try:
            if ca:
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                gflops = float(ca.get("flops", 0.0)) / 1e9
        except Exception:  # noqa: BLE001 — backend without cost analysis
            pass
        n_par = sum(int(np.prod(p.shape))
                    for p in jax.tree_util.tree_leaves(lp[idx]))
        rows.append({"idx": idx, "module": type(spec.block).__name__,
                     "ms": dt, "gflops": gflops, "params": n_par,
                     "shape": tuple(probe.shape)})
        if printout:
            g = f"{gflops:8.2f}" if gflops is not None else "     n/a"
            print(f"{dt:8.2f}ms {g} GFLOPs {n_par:10d} params  "
                  f"l{idx:<3d} {rows[-1]['module']}")

        if spec.is_head:
            break
        y = out
        if idx in plan.save:
            saved[idx] = y
    if printout:
        print(f"{sum(r['ms'] for r in rows):8.2f}ms total "
              f"({sum(r['params'] for r in rows):,d} params)")
    return rows


@dataclasses.dataclass
class Model:
    """Convenience owner of (plan, params, state).

    Mirrors the reference `Model(cfg, ch, nc, anchors)` constructor surface
    (models/yolo.py:508) — but all compute goes through the pure
    `apply_model`, so jit/grad/shard_map compose cleanly.
    """

    plan: GraphPlan
    params: Any
    state: Any

    @classmethod
    def from_yaml(cls, cfg, ch: int = 3, nc: Optional[int] = None,
                  anchors: Optional[list] = None, key=None) -> "Model":
        plan = compile_graph(cfg, ch=ch, nc=nc, anchors=anchors)
        if key is None:
            key = jax.random.PRNGKey(0)
        params, state = init_model(plan, key)
        return cls(plan, params, state)

    @property
    def strides(self):
        return self.plan.strides

    @property
    def head(self):
        return self.plan.head

    def __call__(self, x, training: bool = False, dtype=jnp.float32):
        out, new_state = apply_model(
            self.plan, self.params, self.state, x, training=training, dtype=dtype)
        if training:
            self.state = new_state
        return out

    def num_params(self):
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(self.params))

    def profile(self, x, iters: int = 10, dtype=jnp.float32):
        """Per-layer timing/GFLOPs table (reference
        forward_once(profile=True), yolo.py:614-623)."""
        return profile_layers(self.plan, self.params, self.state, x,
                              iters=iters, dtype=dtype)
