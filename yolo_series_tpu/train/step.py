"""The jitted train step — one XLA program for fwd + loss + bwd + update.

Replaces the reference hot loop body (train.py:344-389: autocast forward,
OTA loss, GradScaler backward, DDP allreduce, accumulate, EMA) with a
single pjit-compiled function:

  * bf16 activations / fp32 params+grads (no GradScaler needed on TPU)
  * gradient accumulation as an in-graph lax.scan over micro-batches
    (reference accumulates across Python iterations, train.py:384)
  * batch sharded over the mesh 'data' axis — XLA inserts the gradient
    all-reduce; BN moments are global automatically (SyncBN semantics);
    bn_shards > 1 opts OUT into the reference's default per-replica BN
    (models/layers._batch_norm_per_replica)
  * EMA update fused into the same program (reference train.py:389)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from yolo_series_tpu.models.model import apply_model
from yolo_series_tpu.parallel.mesh import batch_sharding, replicated
from yolo_series_tpu.train.ema import ema_update
from yolo_series_tpu.train.optim import OptimConfig, make_optimizer


class TrainState(NamedTuple):
    params: Any
    state: Any          # BN running stats
    opt_state: Any
    ema_params: Any
    ema_state: Any
    step: jnp.ndarray   # int32


def init_train_state(params, state, opt_cfg: OptimConfig) -> TrainState:
    opt_init, _ = make_optimizer(opt_cfg, params)
    # materialize independent buffers everywhere — the train step donates its
    # state, so aliasing the caller's trees (or ema aliasing params) breaks
    copy = functools.partial(jax.tree_util.tree_map, jnp.copy)
    return TrainState(
        params=copy(params), state=copy(state), opt_state=opt_init(params),
        ema_params=copy(params), ema_state=copy(state),
        step=jnp.zeros((), jnp.int32))


def make_train_step(plan, loss_fn: Callable, opt_cfg: OptimConfig,
                    mesh=None, accumulate: int = 1,
                    compute_dtype=jnp.bfloat16,
                    ema_base: float = 0.9999,
                    freeze: int = 0,
                    resize_to: Optional[int] = None,
                    loss_scale: float = 1.0,
                    bn_shards: int = 1,
                    remat_prefix: int = 0):
    """Build train_step(ts, images, labels, label_mask, lr_groups, momentum).

    images: (accum, B, H, W, 3) when accumulate > 1, else (B, H, W, 3);
    same leading layout for labels/label_mask. Loss convention follows the
    reference: loss_fn returns loss * per_device-batch... here loss * B
    (global), and gradients are means over micro-batches.
    """
    built = {}  # optimizer needs the params tree for group masks; built at trace

    def loss_and_grad(params, state, images, labels, mask):
        if images.dtype == jnp.uint8:
            # uint8 ingest: ship raw bytes, normalize on device (fp32
            # host-side conversion quadruples H2D traffic — 78 MB/batch
            # bs16@640 vs 20 MB; the serving engine ingests uint8 the
            # same way, infer/serving.py)
            images = images.astype(jnp.float32) / 255.0
        if resize_to is not None and resize_to != images.shape[-3]:
            # device-side multi-scale (reference train.py:360-365); labels
            # are normalized so a full-image resize leaves them unchanged
            b = images.shape[0]
            images = jax.image.resize(
                images, (b, resize_to, resize_to, images.shape[-1]),
                method="bilinear")

        def lf(p):
            # bn_shards > 1: per-replica (unsynced) BN — the reference's
            # multi-GPU default (train.py:240-242; layers._batch_norm_per_replica)
            out, new_state = apply_model(plan, p, state, images,
                                         training=True, dtype=compute_dtype,
                                         bn_shards=bn_shards,
                                         remat_prefix=remat_prefix)
            total, items = loss_fn(out["raw"], labels, mask)
            # loss_scale: the quad-collate gradient compensation
            # (reference `loss *= 4.`, train.py:377-378) — scales the
            # GRADIENT only; logged metrics stay unscaled like the
            # reference's loss_items
            return total * loss_scale, (items, new_state)

        (total, (items, new_state)), grads = jax.value_and_grad(
            lf, has_aux=True)(params)
        return total / loss_scale, items, new_state, grads

    def train_step(ts: TrainState, images, labels, mask, lr_groups, momentum):
        if "opt" not in built:
            built["opt"] = make_optimizer(opt_cfg, ts.params)
        _, opt_update = built["opt"]

        if accumulate > 1:
            def body(carry, micro):
                g_acc, state_c, tot_acc = carry
                im, lb, mk = micro
                tot, items, state_n, grads = loss_and_grad(
                    ts.params, state_c, im, lb, mk)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                return (g_acc, state_n, tot_acc + tot), items

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, ts.params)
            # unroll fully: `accumulate` is static and small (<= nbs/bs), and
            # XLA:CPU runs conv fwd+bwd inside a rolled while-loop body ~17x
            # slower per image (measured: 137 s vs 3.9 s/step for the same
            # work, yolov7-tiny bs8@320) — unrolling restores full fusion
            # and keeps TPU semantics/identical grads
            (grads, new_state, total), items_seq = jax.lax.scan(
                body, (zero_g, ts.state, jnp.float32(0.0)),
                (images, labels, mask), unroll=accumulate)
            # reference semantics: per-micro-batch losses are loss*bs and
            # .backward() SUMS their grads before the optimizer step
            # (train.py:372-384) — the accumulated grad equals one
            # nominal-batch grad. Only the logged loss is averaged.
            total = total / accumulate
            items = jax.tree_util.tree_map(lambda x: jnp.mean(x), items_seq)
        else:
            total, items, new_state, grads = loss_and_grad(
                ts.params, ts.state, images, labels, mask)

        new_params, new_opt = opt_update(ts.opt_state, ts.params, grads,
                                         lr_groups, momentum)
        if freeze > 0:
            # hard-freeze the first `freeze` layers: params AND optimizer
            # slots stay untouched (reference --freeze sets
            # requires_grad=False, train.py:102-107 — decay must not move
            # frozen weights either)
            pl = list(new_params["layers"])
            for li in range(min(freeze, len(pl))):
                pl[li] = ts.params["layers"][li]
            new_params = {**new_params, "layers": pl}
            vl = list(new_opt["v"]["layers"])
            for li in range(min(freeze, len(vl))):
                vl[li] = ts.opt_state["v"]["layers"][li]
            new_opt = {**new_opt, "v": {**new_opt["v"], "layers": vl}}
        step = ts.step + 1
        updates = step.astype(jnp.float32)
        new_ema_p = ema_update(ts.ema_params, new_params, updates, ema_base)
        new_ema_s = ema_update(ts.ema_state, new_state, updates, ema_base)
        new_ts = TrainState(new_params, new_state, new_opt,
                            new_ema_p, new_ema_s, step)
        metrics = dict(items)
        metrics["total"] = total
        return new_ts, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        # with in-graph accumulation the micro-batch axis leads; shard the
        # batch axis (axis 1) in that case
        spec = P(None, "data") if accumulate > 1 else P("data")
        bsh = NamedSharding(mesh, spec)
        rep = replicated(mesh)
        n_batch_args = 3
        # TrainState sharding is inferred from the actual arrays (params may
        # carry tensor-parallel shardings, parallel/mesh.param_partition_specs)
        in_shardings = (None,) + (bsh,) * n_batch_args + (rep, rep)
        train_step = jax.jit(train_step,
                             in_shardings=in_shardings,
                             out_shardings=(None, rep),
                             donate_argnums=(0,))
    else:
        train_step = jax.jit(train_step, donate_argnums=(0,))
    return train_step
