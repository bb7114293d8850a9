from booster_gym_tpu.parallel.mesh import (
    make_mesh,
    env_sharding,
    replicated,
    shard_batch_pytree,
    initialize_distributed,
)

__all__ = [
    "make_mesh",
    "env_sharding",
    "replicated",
    "shard_batch_pytree",
    "initialize_distributed",
]
