from imagefolder_tpu.parallel.mesh import (
    fsdp_shard_params,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "fsdp_shard_params"]
