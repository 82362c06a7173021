from fddm_asr_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    decoder_param_spec,
    shard_pytree,
    batch_sharding,
    replicate,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "decoder_param_spec",
    "shard_pytree",
    "batch_sharding",
    "replicate",
]
