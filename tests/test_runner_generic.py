"""Generic runner: SAC and TD3 through the same scaffold."""

import jax
import numpy as np
import pytest

from raptor_tpu.env import EnvConfig, L2F, sample_population
from raptor_tpu.rl import runner, runner_generic, sac, td3


@pytest.mark.parametrize("spec_name", ["sac", "td3"])
def test_generic_super_step(spec_name):
    env = L2F(EnvConfig())
    run_cfg = runner.RunnerConfig(
        n_envs=8, rollout_length=4, gradient_steps=4, batch_size=32,
        replay_capacity=64,
    )
    if spec_name == "sac":
        spec = runner_generic.sac_spec(
            sac.SACConfig(actor_hidden=(16, 16), critic_hidden=(16, 16))
        )
    else:
        spec = runner_generic.td3_spec(
            td3.TD3Config(actor_hidden=(16, 16), critic_hidden=(16, 16))
        )
    params = sample_population(jax.random.key(0), 8)
    state = runner_generic.generic_trainer_init(
        jax.random.key(1), env, params, run_cfg, spec
    )
    step = runner_generic.make_generic_super_step(env, run_cfg, spec)
    state, metrics = step(state, params)
    state, metrics = step(state, params)
    assert np.isfinite(float(metrics.critic_loss))
    assert int(state.total_env_steps) == 2 * 4 * 8
    assert int(state.buffer.size) == 8
