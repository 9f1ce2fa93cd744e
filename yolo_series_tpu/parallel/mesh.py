"""Device mesh + sharding rules — the framework's entire distributed layer.

Replaces every distributed mechanism in the reference (SURVEY.md §2.7):

  reference                              | here
  ---------------------------------------+----------------------------------
  torch DataParallel (train.py:236)      | batch sharded over the 'data'
  DDP + NCCL allreduce (train.py:282)    |   mesh axis under jit; XLA
                                         |   inserts the gradient reductions
  loss *= world_size hack (train.py:375) | gone — global-batch semantics
  SyncBatchNorm opt-in (train.py:240)    | automatic: BN moments are global
                                         |   means under pjit partitioning
  DistributedSampler (datasets.py:86)    | host_local_slice per process
  dist.broadcast of sampled indices      | jax.experimental.multihost_utils
  torch_distributed_zero_first barrier   | process-0 cache build + barrier

The mesh carries two axes: 'data' (batch parallelism over ICI) and 'model'
(reserved for tensor-parallel sharding; size 1 for every shipped model —
the reference has no TP/PP/SP either, SURVEY.md §2.7). Keeping the axis in
the mesh means turning TP on later is a sharding-rule change, not a
rewrite.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put a host batch with the leading axis sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def host_local_slice(n: int, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> slice:
    """This host's contiguous shard of a length-n global batch (the
    multi-host analog of DistributedSampler's index partitioning)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n // pc
    return slice(pi * per, (pi + 1) * per)


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int, local_device_ids=None):
    """Multi-process (multi-host) runtime init — the TPU analog of the
    reference's torch.distributed.init_process_group('nccl', 'env://')
    (train.py:579-613). After this, jax.devices() is the GLOBAL device
    list and jax.local_devices() this process's slice; one mesh over the
    global devices replaces DDP."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)


def global_batch_from_host_local(mesh: Mesh, tree: Any) -> Any:
    """Assemble a globally-sharded batch from THIS process's host-local
    shard (the counterpart of DistributedSampler feeding per-rank slices,
    reference datasets.py:86 + train.py:613: per-rank batch = total/world).

    Each process passes its `host_local_slice` of the global batch; the
    result is one jax.Array per leaf, batch-sharded over the 'data' axis,
    usable exactly like a single-process sharded batch."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        tree)


def sync_processes(tag: str = "barrier"):
    """Cross-process barrier (reference torch_distributed_zero_first /
    dist.barrier, torch_utils.py:27-36) — no-op in single-process runs."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def param_partition_specs(params, n_model: int, model_axis: str = "model"):
    """Tensor-parallel sharding rules: a PartitionSpec pytree matching params.

    The reference has no TP (SURVEY.md §2.7); here the reserved 'model' mesh
    axis is made real with Megatron-style column-parallel conv weights:
    every 4-D conv kernel whose output-channel count divides the model-axis
    size is sharded over that axis (XLA propagates the sharding through the
    conv and inserts the gathers/reshards it needs); everything else —
    biases, BN, implicit vectors, odd-channel head convs — replicates.
    """
    def spec_for(path, leaf):
        name = ""
        for p in reversed(path):
            k = getattr(p, "key", None)
            if isinstance(k, str):
                name = k
                break
        if (name == "w" and getattr(leaf, "ndim", 0) == 4
                and leaf.shape[-1] % n_model == 0):
            return P(None, None, None, model_axis)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [spec_for(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)
