"""Device mesh + sharding rules (SPMD data parallelism, optional model axis)."""

from split_vae_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    infer_param_sharding,
    shard_state,
)
