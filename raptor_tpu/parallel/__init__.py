from raptor_tpu.parallel.mesh import (  # noqa: F401
    env_sharding,
    make_mesh,
    replicate_pytree,
    replicated,
    shard_buffer_pytree,
    shard_env_pytree,
    shard_trainer_state,
)
