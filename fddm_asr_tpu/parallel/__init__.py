from fddm_asr_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    decoder_param_spec,
    shard_pytree,
    batch_sharding,
    replicate,
)
from fddm_asr_tpu.parallel.distributed import (
    DistributedConfig,
    initialize,
    process_group,
    is_primary,
    host_shard,
    make_global_mesh,
    put_global_batch,
    all_hosts_mean,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "decoder_param_spec",
    "shard_pytree",
    "batch_sharding",
    "replicate",
    "DistributedConfig",
    "initialize",
    "process_group",
    "is_primary",
    "host_shard",
    "make_global_mesh",
    "put_global_batch",
    "all_hosts_mean",
]
