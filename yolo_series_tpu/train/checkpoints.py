"""Checkpoint save/load/resume (reference train.py:465-489 + general.py:820
strip_optimizer + experimental.py:247 attempt_load).

Native format: a single pickle of numpy-ified pytrees + the model cfg dict
— fully self-contained (no class pickling, unlike the reference's
whole-module pickles that force torch-version shims, SURVEY.md §5).
Contents mirror the reference dict: {epoch, best_fitness, results, params,
state, ema_params, ema_state, opt_state, step, cfg, hyp}.

`load_checkpoint_any` also accepts reference/upstream .pt checkpoints via
the torch importer, so existing weights migrate directly.
"""

from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_jax(tree, dtype=None):
    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a
    return jax.tree_util.tree_map(conv, tree)


def save_checkpoint(path, train_state, cfg: dict, *, epoch: int = 0,
                    best_fitness: float = 0.0, results=None, hyp=None,
                    half: bool = True):
    """Write a training checkpoint. `half` stores fp16 weights (the
    reference saves fp16 copies, train.py:467-469)."""
    cast = (lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(np.float16) if np.issubdtype(np.asarray(x).dtype, np.floating)
        and np.asarray(x).dtype == np.float32 else np.asarray(x), _to_numpy(t)))
    blob = {
        "format": "yolo-series-tpu-ckpt-v1",
        "epoch": epoch,
        "best_fitness": best_fitness,
        "results": results,
        "hyp": hyp,
        "cfg": cfg,
        "step": int(train_state.step),
        "params": cast(train_state.params) if half else _to_numpy(train_state.params),
        "state": _to_numpy(train_state.state),
        "ema_params": cast(train_state.ema_params) if half else _to_numpy(train_state.ema_params),
        "ema_state": _to_numpy(train_state.ema_state),
        "opt_state": _to_numpy(train_state.opt_state),
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    assert blob.get("format", "").startswith("yolo-series-tpu-ckpt"), \
        f"not a yolo-series-tpu checkpoint: {path}"
    return blob


def restore_train_state(blob, opt_cfg):
    """Checkpoint blob -> TrainState (fp32 params for training resume)."""
    from yolo_series_tpu.train.step import TrainState

    return TrainState(
        params=_to_jax(blob["params"], jnp.float32),
        state=_to_jax(blob["state"], jnp.float32),
        opt_state=_to_jax(blob["opt_state"]),
        ema_params=_to_jax(blob["ema_params"], jnp.float32),
        ema_state=_to_jax(blob["ema_state"], jnp.float32),
        step=jnp.asarray(blob["step"], jnp.int32),
    )


def strip_checkpoint(src, dst=None):
    """Finalize for deploy: ema -> params, drop optimizer/results, fp16
    (reference strip_optimizer, general.py:820-833)."""
    blob = load_checkpoint(src)
    out = {
        "format": "yolo-series-tpu-ckpt-v1",
        "epoch": -1, "best_fitness": blob.get("best_fitness", 0.0),
        "results": None, "hyp": blob.get("hyp"), "cfg": blob["cfg"],
        "step": blob.get("step", 0),
        "params": blob.get("ema_params") or blob["params"],
        "state": blob.get("ema_state") or blob["state"],
        "ema_params": None, "ema_state": None, "opt_state": None,
    }
    dst = dst or src
    with open(dst, "wb") as f:
        pickle.dump(out, f, protocol=4)
    return dst


def get_latest_run(search_dir="runs"):
    """Newest last.ckpt under search_dir (reference general.py:47-50)."""
    paths = sorted(Path(search_dir).rglob("last.ckpt"),
                   key=lambda p: p.stat().st_mtime)
    return str(paths[-1]) if paths else ""


def load_checkpoint_any(weights: str, cfg: Optional[str] = None,
                        prefer_ema: bool = True):
    """Load weights from any supported source -> (plan, params, state).

    .pt      reference/upstream torch checkpoint (needs cfg yaml)
    .ckpt    native checkpoint (cfg embedded)
    """
    from yolo_series_tpu.models.graph import compile_graph

    w = str(weights)
    if w.endswith(".pt"):
        assert cfg is not None, "--cfg is required to import a .pt checkpoint"
        plan = compile_graph(cfg)
        from yolo_series_tpu.models.torch_import import load_torch_checkpoint
        params, state = load_torch_checkpoint(w, plan, prefer_ema=prefer_ema)
        return plan, params, state
    blob = load_checkpoint(w)
    plan = compile_graph(blob["cfg"]) if cfg is None else compile_graph(cfg)
    params_np = (blob.get("ema_params") if prefer_ema and blob.get("ema_params")
                 else blob["params"])
    state_np = (blob.get("ema_state") if prefer_ema and blob.get("ema_state")
                else blob["state"])
    return plan, _to_jax(params_np, jnp.float32), _to_jax(state_np, jnp.float32)
