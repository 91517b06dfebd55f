"""Multi-host SPMD: pod-slice scaling for the training stack.

The reference's only multi-machine story is a shell process farm over a
shared filesystem (SURVEY §3.7). Here, `jax.distributed.initialize` turns
the same single-program trainer into a multi-host SPMD program: the global
mesh spans all processes, envs/replay shard over the global 'env' axis
(each host owns its local slice — rollouts never cross hosts), and learner
gradients reduce over ICI within a slice / DCN across slices, inserted
automatically by XLA from the sharding layout.

Per-host RNG discipline (SURVEY §7 Stage 4 "hard part"): fold the process
index into every host-local key so hosts draw independent streams while
jitted global programs stay deterministic.

This module is exercised single-process in CI (virtual device mesh); on a
real pod slice call `initialize_distributed()` first in every process (same
program, standard JAX multi-process launch).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's distributed runtime. On TPU pods with standard env
    vars, bare `jax.distributed.initialize()` autodetects everything.

    Must run before anything touches a backend (even jax.process_count()
    initializes one — never probe first). Re-initialization and genuinely
    single-process environments are tolerated; any other failure is
    re-raised so a pod launch can't silently fall back to single-host."""
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg:
            return  # initialized earlier in this process — fine
        if "must be called before" in msg and not _cluster_env_present(
            coordinator_address
        ):
            # a backend already exists but there is no cluster to join:
            # benign single-process use (e.g. late call in a script/test)
            return
        raise
    except ValueError:
        # no coordinator/cluster env detected: single-process environment
        pass


_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
    "TPU_WORKER_ID",
)


def _cluster_env_present(coordinator_address) -> bool:
    import os

    if coordinator_address is not None:
        return True
    return any(os.environ.get(v) for v in _CLUSTER_ENV_VARS)


def host_key(key: jax.Array, process_index: Optional[int] = None) -> jax.Array:
    """Fold the process index into a key: independent per-host streams."""
    idx = jax.process_index() if process_index is None else process_index
    return jax.random.fold_in(key, idx)


def global_env_count(n_envs_per_host: int) -> int:
    return n_envs_per_host * jax.process_count()


def make_global_array(local_arrays, mesh, spec):
    """Assemble a global jax.Array from per-host local shards (the
    multi-host handoff for env states / replay shards)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_arrays)


def scaling_report(steps_per_s_1: float, steps_per_s_n: float, n: int) -> dict:
    """Scaling-efficiency metric (BASELINE north-star: >=80%)."""
    eff = steps_per_s_n / (steps_per_s_1 * n) if steps_per_s_1 > 0 else 0.0
    return {
        "devices": n,
        "steps_per_s": steps_per_s_n,
        "scaling_efficiency": eff,
    }
