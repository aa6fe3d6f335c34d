from infodiffusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from infodiffusion_tpu.parallel.fsdp import (
    fsdp_param_sharding,
    place_state,
    shard_state_fsdp,
)
from infodiffusion_tpu.parallel.tp import (
    shard_state_tp,
    tp_param_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "fsdp_param_sharding",
    "place_state",
    "shard_state_fsdp",
    "tp_param_sharding",
    "shard_state_tp",
]
