from imagefolder_tpu.parallel.mesh import (
    fsdp_shard_params,
    tp_shard_params,
    init_distributed,
    make_mesh,
    process_allgather,
    replicate,
    shard_batch,
    sync_global_devices,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "fsdp_shard_params",
           "tp_shard_params",
           "init_distributed", "sync_global_devices", "process_allgather"]
