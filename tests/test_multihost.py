"""Multi-host utilities (single-process CI: semantics that don't need a
real pod) + population-axis sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.parallel import make_mesh
from raptor_tpu.parallel.multihost import (
    global_env_count,
    host_key,
    initialize_distributed,
    scaling_report,
)


def test_initialize_distributed_single_process_noop():
    initialize_distributed()
    assert jax.process_count() == 1


def test_host_key_streams_differ():
    base = jax.random.key(42)
    k0 = host_key(base, process_index=0)
    k1 = host_key(base, process_index=1)
    a = jax.random.normal(k0, (4,))
    b = jax.random.normal(k1, (4,))
    assert float(jnp.max(jnp.abs(a - b))) > 1e-3
    # deterministic per index
    np.testing.assert_array_equal(
        np.asarray(jax.random.normal(host_key(base, 1), (4,))), np.asarray(b)
    )


def test_scaling_report():
    rep = scaling_report(100.0, 640.0, 8)
    assert rep["scaling_efficiency"] == 0.8
    assert global_env_count(32) == 32 * jax.process_count()


def test_population_axis_sharding():
    """Teacher population sharded over the 'pop' mesh axis: vmapped SAC
    updates run with per-member state distributed across devices."""
    from raptor_tpu.rl import sac

    K = 8
    mesh = make_mesh(8, ("pop",))
    states = jax.vmap(lambda k: sac.sac_init(k, 6, 2))(
        jax.random.split(jax.random.key(0), K)
    )
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("pop"))
    states = jax.tree.map(
        lambda x: jax.device_put(x, sharding) if x.ndim >= 1 else x, states
    )
    batch = (
        jnp.ones((K, 16, 6)), jnp.zeros((K, 16, 2)), jnp.ones((K, 16)),
        jnp.ones((K, 16, 6)), jnp.zeros((K, 16)),
    )
    batch = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    new_states, metrics = jax.jit(jax.vmap(sac.sac_update))(
        states, jax.random.split(jax.random.key(1), K), batch
    )
    assert np.all(np.isfinite(np.asarray(metrics.critic_loss)))
    # population members stay sharded across devices
    leaf = jax.tree.leaves(new_states.actor)[0]
    assert len(leaf.sharding.device_set) == 8
