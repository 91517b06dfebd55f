"""Device-mesh utilities: SPMD scaling for the training stack.

The reference has NO distributed backend (SURVEY §3.7: the only parallel
axes are a vectorized env batch and a 1000-process teacher farm communicating
through the filesystem). The TPU-native replacement is a
`jax.sharding.Mesh` with named axes:

  - 'env'  — environments, replay rows, and rollout batches are sharded
             along their env dimension; collectives ride ICI.
  - 'pop'  — (foundation recipe) the teacher-population axis; each shard
             trains a slice of the K vmapped SAC learners.

The learner parameters are replicated; gradient reductions appear
automatically when jit partitions the update over sharded batches — no
hand-written NCCL/MPI (or psum) plumbing.

`jax.distributed.initialize` extends the same program to multi-host pods:
the mesh simply spans processes and DCN/ICI placement follows the axis
order (hosts outermost). See SURVEY §3.7 "TPU-native mapping".
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("env",)
) -> Mesh:
    """1-D (or factored) mesh over the first n_devices. For 2-D meshes pass
    axis_names=('pop', 'env') and n_devices as a perfect factorization is
    chosen automatically (pop outermost — cross-host traffic is rare on the
    population axis)."""
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    elif len(axis_names) == 2:
        pop = int(np.gcd(n, max(1, int(np.sqrt(n)))))
        shape = (pop, n // pop)
    else:
        raise ValueError("only 1-D/2-D meshes supported")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def env_sharding(mesh: Mesh, rank: int, env_axis: int = 0) -> NamedSharding:
    """NamedSharding placing the env dimension of a rank-`rank` array on the
    'env' mesh axis, everything else replicated."""
    spec = [None] * rank
    spec[env_axis] = "env"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_pytree(tree, mesh: Mesh, env_axis: int = 0):
    """Shard every leaf of a pytree along its `env_axis` dimension (used for
    vmapped params / EnvState / obs)."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, env_sharding(mesh, getattr(x, "ndim", 0), env_axis)
        )
        if getattr(x, "ndim", 0) > env_axis
        else jax.device_put(x, replicated(mesh)),
        tree,
    )


def shard_buffer_pytree(buffer, mesh: Mesh):
    """Replay buffers are [capacity, n_envs, ...] — shard the env axis (1);
    scalars (ptr/size) replicated."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x,
            env_sharding(mesh, x.ndim, env_axis=1)
            if getattr(x, "ndim", 0) >= 2
            else replicated(mesh),
        ),
        buffer,
    )


def replicate_pytree(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)


def shard_trainer_state(state, mesh: Mesh):
    """Lay out a runner.TrainerState for SPMD: envs + replay sharded on
    'env', learner + RNG replicated."""
    return state.replace(
        sac=replicate_pytree(state.sac, mesh),
        buffer=shard_buffer_pytree(state.buffer, mesh),
        env_state=shard_env_pytree(state.env_state, mesh),
        obs=jax.device_put(state.obs, env_sharding(mesh, state.obs.ndim)),
        key=jax.device_put(state.key, replicated(mesh)),
        total_env_steps=jax.device_put(state.total_env_steps, replicated(mesh)),
    )
