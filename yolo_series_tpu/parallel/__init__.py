from yolo_series_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    host_local_slice,
    init_distributed,
    global_batch_from_host_local,
    sync_processes,
)
