from infodiffusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from infodiffusion_tpu.parallel.fsdp import (
    fsdp_param_sharding,
    shard_state_fsdp,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "fsdp_param_sharding",
    "shard_state_fsdp",
]
