"""Multi-device SPMD tests on the virtual 8-device CPU mesh (SURVEY §5.3:
'distributed tests the reference lacks')."""

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.env import EnvConfig, L2F, sample_population
from raptor_tpu.parallel import make_mesh, shard_trainer_state, shard_env_pytree
from raptor_tpu.rl import runner, sac


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(8, ("pop", "env"))
    assert mesh2.devices.size == 8


def test_sharded_env_rollout_matches_single_device():
    """Same seeds, sharded vs unsharded: identical trajectories."""
    env = L2F(EnvConfig())
    n = 32
    params = sample_population(jax.random.key(0), n)
    v_reset, v_step = env.vector_ops()
    keys = jax.random.split(jax.random.key(1), n)

    def run(params_in, keys_in):
        es, obs = v_reset(keys_in, params_in)
        for _ in range(5):
            es, obs, r, d, _ = jax.jit(v_step)(params_in, es, jnp.zeros((n, 4)))
        return np.asarray(obs)

    ref = run(params, keys)
    mesh = make_mesh(8)
    params_sh = shard_env_pytree(params, mesh)
    keys_sh = jax.device_put(keys, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("env")))
    got = run(params_sh, keys_sh)
    np.testing.assert_allclose(ref, got, atol=1e-6)


def test_sharded_super_step_runs():
    """Full SAC super-step with envs+replay sharded over 8 devices."""
    env = L2F(EnvConfig())
    run_cfg = runner.RunnerConfig(
        n_envs=32, rollout_length=4, gradient_steps=4, batch_size=64,
        replay_capacity=128,
    )
    sac_cfg = sac.SACConfig(actor_hidden=(32, 32), critic_hidden=(32, 32))
    params = sample_population(jax.random.key(0), run_cfg.n_envs)
    state = runner.trainer_init(jax.random.key(1), env, params, run_cfg, sac_cfg)

    mesh = make_mesh(8)
    state = shard_trainer_state(state, mesh)
    params = shard_env_pytree(params, mesh)

    super_step = runner.make_super_step(env, run_cfg, sac_cfg)
    state, metrics = super_step(state, params)
    state, metrics = super_step(state, params)
    assert np.isfinite(float(metrics.critic_loss))
    # learner params must be fully replicated after the step
    leaf = jax.tree.leaves(state.sac.actor)[0]
    assert leaf.sharding.is_fully_replicated
    # buffer rows stay sharded over envs
    assert not state.buffer.obs.sharding.is_fully_replicated
