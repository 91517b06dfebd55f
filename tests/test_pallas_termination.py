"""In-kernel termination: dead envs freeze; alive/length stats match the
XLA termination contract."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from raptor_tpu.env import EnvConfig, L2F, presets, sample_population
from raptor_tpu.ops import pallas_rollout as pr


def test_terminated_envs_freeze_and_count():
    env = L2F(EnvConfig())
    n = 128
    params = sample_population(jax.random.key(0), n)
    v_reset, _ = env.vector_ops()
    es, _ = v_reset(jax.random.split(jax.random.key(1), n), params)

    # zero-throttle: every quad free-falls through the 0.6 m position bound
    action = -jnp.ones((n, 4))
    with pltpu.force_tpu_interpret_mode():
        final, alive, length = pr.fused_rollout(
            params, es.dynamics, action, 200
        )
    assert np.all(np.asarray(alive) == 0.0)  # all dead after 2 s of falling
    lengths = np.asarray(length)
    assert np.all(lengths < 200) and np.all(lengths > 0)
    # frozen at (just past) the bound, not at -200*dt^2 style free-fall depth
    z = np.asarray(final.position[:, 2])
    assert np.all(z > -1.0)
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(final)[0])))


def test_hovering_env_survives():
    from raptor_tpu.env import dynamics

    params1 = presets.crazyflie()
    n = 4
    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), params1)
    from raptor_tpu.env.types import State

    state = State(
        position=jnp.zeros((n, 3)),
        orientation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        linear_velocity=jnp.zeros((n, 3)),
        angular_velocity=jnp.zeros((n, 3)),
        rpm=jnp.tile(dynamics.hover_rpm(params1), (n, 4)),
    )
    action = jnp.tile(dynamics.hover_action(params1), (n, 4))
    with pltpu.force_tpu_interpret_mode():
        final, alive, length = pr.fused_rollout(params, state, action, 300)
    assert np.all(np.asarray(alive) == 1.0)
    assert np.all(np.asarray(length) == 300)
    assert np.all(np.abs(np.asarray(final.position)) < 0.05)


def test_non_divisible_rows_not_dropped():
    """Regression: envs beyond the last full block were silently zeroed
    when rows % block_rows != 0 (flooring grid)."""
    from raptor_tpu.env import EnvConfig, L2F, sample_population

    env = L2F(EnvConfig())
    n = 9 * 1024  # rows = 72, not divisible by the default block_rows
    params = sample_population(jax.random.key(0), n)
    v_reset, _ = env.vector_ops()
    es, _ = v_reset(jax.random.split(jax.random.key(1), n), params)
    action = jnp.zeros((n, 4))
    with pltpu.force_tpu_interpret_mode():
        final, alive, length = pr.fused_rollout(
            params, es.dynamics, action, 3, pos_bound=1e9, angvel_bound=1e9
        )
    # every env (including the tail blocks) must have been stepped
    assert np.all(np.asarray(length) == 3)
    moved = np.linalg.norm(
        np.asarray(final.position) - np.asarray(es.dynamics.position), axis=-1
    )
    assert np.count_nonzero(moved > 0) > n * 0.99
