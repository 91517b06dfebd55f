"""SAC learner: mechanics + a short learning smoke test on fixed dynamics
(SURVEY §7 Stage 2 validation: hover task on fixed dynamics learns)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.env import EnvConfig, InitConfig, L2F, presets
from raptor_tpu.rl import evaluation, networks, runner, sac


def test_sample_and_squash_logprob():
    """log-prob matches a numerical change-of-variables check."""
    key = jax.random.key(0)
    mu = jnp.array([[0.3, -0.5]])
    log_std = jnp.array([[-1.0, -0.5]])
    action, logp = networks.sample_and_squash(key, mu, log_std)
    assert action.shape == (1, 2)
    assert np.all(np.abs(np.asarray(action)) < 1.0)
    # recompute log-prob from the sampled pre-tanh value
    pre = jnp.arctanh(jnp.clip(action, -0.999999, 0.999999))
    std = jnp.exp(log_std)
    normal_lp = -0.5 * ((pre - mu) / std) ** 2 - log_std - 0.5 * np.log(2 * np.pi)
    corr = jnp.log(1.0 - jnp.tanh(pre) ** 2 + 1e-9)
    expect = float(jnp.sum(normal_lp - corr))
    assert abs(float(logp[0]) - expect) < 1e-3


def test_sac_update_moves_parameters():
    key = jax.random.key(0)
    state = sac.sac_init(key, obs_dim=5, action_dim=2)
    batch = (
        jnp.ones((32, 5)),
        jnp.zeros((32, 2)),
        jnp.ones((32,)),
        jnp.ones((32, 5)),
        jnp.zeros((32,)),
    )
    new_state, metrics = jax.jit(sac.sac_update)(state, jax.random.key(1), batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics.critic_loss))
    # params actually moved
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.actor, new_state.actor
    )
    assert max(jax.tree.leaves(diff)) > 0.0
    # target critic moved by polyak, less than critic
    tc = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.target_critic,
            new_state.target_critic,
        )
    )
    assert 0.0 < max(tc) < 0.01


def test_population_vmap_sac():
    """The teacher farm as a population axis: vmap(sac_update) over K members."""
    k = 4
    keys = jax.random.split(jax.random.key(0), k)
    states = jax.vmap(lambda kk: sac.sac_init(kk, 5, 2))(keys)
    batch = (
        jnp.ones((k, 16, 5)),
        jnp.zeros((k, 16, 2)),
        jnp.ones((k, 16)),
        jnp.ones((k, 16, 5)),
        jnp.zeros((k, 16)),
    )
    new_states, metrics = jax.jit(jax.vmap(sac.sac_update))(
        states, jax.random.split(jax.random.key(1), k), batch
    )
    assert metrics.critic_loss.shape == (k,)
    assert np.all(np.isfinite(np.asarray(metrics.critic_loss)))


@pytest.mark.slow
def test_sac_learns_hover():
    """Short training on fixed crazyflie dynamics improves eval return."""
    env = L2F(
        EnvConfig(
            episode_length=200,
            init=InitConfig(position_range=0.1, max_angle=0.5,
                            linear_velocity_std=0.05, angular_velocity_std=0.05),
        )
    )
    run_cfg = runner.RunnerConfig(
        n_envs=32,
        rollout_length=16,
        gradient_steps=16,
        batch_size=128,
        replay_capacity=2048,
    )
    sac_cfg = sac.SACConfig(actor_hidden=(32, 32), critic_hidden=(32, 32))
    params1 = presets.crazyflie()
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (run_cfg.n_envs,) + x.shape), params1
    )
    state = runner.trainer_init(jax.random.key(0), env, params, run_cfg, sac_cfg)

    warmup = runner.make_warmup_step(env, run_cfg)
    super_step = runner.make_super_step(env, run_cfg, sac_cfg)

    def eval_return(sac_state):
        m = 16
        p_eval = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (m,) + x.shape), presets.crazyflie()
        )
        step_fn, carry = evaluation.mlp_policy_step(sac_state.actor)
        stats = evaluation.evaluate(
            env, p_eval, step_fn, carry, jax.random.key(7), m, episode_length=200
        )
        return float(stats.return_mean)

    for _ in range(4):
        state = warmup(state, params)
    before = eval_return(state.sac)
    for _ in range(60):
        state, metrics = super_step(state, params)
    after = eval_return(state.sac)
    assert np.isfinite(after)
    assert after > before + 20.0, f"no learning: {before} -> {after}"
