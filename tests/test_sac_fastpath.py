"""Tests for the TPU learner fast path (VERDICT r3 weak #1): bf16/MXU
matmuls, stacked twin critics, flattened optimizers.

The fast path must be (a) numerically identical where it claims to be
(stack_critics, flat_optim), (b) bf16-close where it rounds
(compute_dtype), and (c) still learn (end-to-end SAC smoke with all flags).
Reference anchor: the reference farm trains its SAC teachers in f32 on CPU
(README:207); our quality gate is a paired teacher wave, these tests are
the cheap invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.rl import networks, sac


def _rand_batch(key, b, obs_dim, act_dim):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return (
        jax.random.normal(k1, (b, obs_dim)),
        jnp.tanh(jax.random.normal(k2, (b, act_dim))),
        jax.random.normal(k3, (b,)),
        jax.random.normal(k4, (b, obs_dim)),
        (jax.random.uniform(k5, (b,)) < 0.1).astype(jnp.float32),
    )


def test_matmul_lp_forward_and_grads_close_to_f32():
    key = jax.random.key(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (32, 24))
    w = jax.random.normal(kw, (24, 16)) / 5.0

    y_ref = x @ w
    y_lp = networks.matmul_lp(jnp.bfloat16, x, w)
    assert y_lp.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(y_lp - y_ref))) < 0.15  # bf16 rounding

    f_ref = lambda x, w: jnp.sum(jnp.tanh(x @ w))
    f_lp = lambda x, w: jnp.sum(jnp.tanh(networks.matmul_lp(jnp.bfloat16, x, w)))
    gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
    gx_lp, gw_lp = jax.grad(f_lp, argnums=(0, 1))(x, w)
    assert gx_lp.dtype == jnp.float32 and gw_lp.dtype == jnp.float32
    # relative error at bf16 scale
    for g_lp, g_ref in ((gx_lp, gx_ref), (gw_lp, gw_ref)):
        rel = jnp.max(jnp.abs(g_lp - g_ref)) / (jnp.max(jnp.abs(g_ref)) + 1e-9)
        assert float(rel) < 0.05


def test_matmul_lp_batched_and_vmapped():
    key = jax.random.key(1)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (2, 8, 6))
    w = jax.random.normal(kw, (2, 6, 4))
    y = networks.matmul_lp(jnp.bfloat16, x, w)
    assert y.shape == (2, 8, 4)
    y_v = jax.vmap(lambda a, b: networks.matmul_lp(jnp.bfloat16, a, b))(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_v), atol=1e-6)
    # grads under vmap (the population learner path)
    g = jax.grad(
        lambda w: jnp.sum(
            jax.vmap(lambda a, b: networks.matmul_lp(jnp.bfloat16, a, b))(x, w)
        )
    )(w)
    assert g.shape == w.shape and bool(jnp.all(jnp.isfinite(g)))


def test_stacked_critic_matches_unstacked_exactly():
    key = jax.random.key(2)
    critic = networks.critic_init(key, 9, 4)
    obs = jax.random.normal(jax.random.key(3), (17, 9))
    act = jnp.tanh(jax.random.normal(jax.random.key(4), (17, 4)))
    q1a, q2a = networks.critic_apply(critic, obs, act)
    q1b, q2b = networks.critic_apply(critic, obs, act, stacked=True)
    np.testing.assert_allclose(np.asarray(q1a), np.asarray(q1b), atol=2e-6)
    np.testing.assert_allclose(np.asarray(q2a), np.asarray(q2b), atol=2e-6)


def test_flat_optim_update_identical():
    obs_dim, act_dim, b = 9, 4, 64
    batch = _rand_batch(jax.random.key(5), b, obs_dim, act_dim)
    cfg_ref = sac.SACConfig()
    cfg_flat = sac.SACConfig(flat_optim=True)
    s_ref = sac.sac_init(jax.random.key(6), obs_dim, act_dim, cfg_ref)
    s_flat = sac.sac_init(jax.random.key(6), obs_dim, act_dim, cfg_flat)
    for i in range(3):
        k = jax.random.key(100 + i)
        s_ref, m_ref = sac.sac_update(s_ref, k, batch, cfg_ref)
        s_flat, m_flat = sac.sac_update(s_flat, k, batch, cfg_flat)
    for a, b_ in zip(jax.tree.leaves(s_ref.actor), jax.tree.leaves(s_flat.actor)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
    np.testing.assert_allclose(
        float(m_ref.critic_loss), float(m_flat.critic_loss), rtol=1e-5
    )


def test_stacked_critic_update_matches_default():
    obs_dim, act_dim, b = 9, 4, 64
    batch = _rand_batch(jax.random.key(7), b, obs_dim, act_dim)
    cfg_a = sac.SACConfig()
    cfg_b = sac.SACConfig(stack_critics=True)
    s_a = sac.sac_init(jax.random.key(8), obs_dim, act_dim, cfg_a)
    s_b = sac.sac_init(jax.random.key(8), obs_dim, act_dim, cfg_b)
    k = jax.random.key(9)
    s_a, _ = sac.sac_update(s_a, k, batch, cfg_a)
    s_b, _ = sac.sac_update(s_b, k, batch, cfg_b)
    for x, y in zip(jax.tree.leaves(s_a.critic), jax.tree.leaves(s_b.critic)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


@pytest.mark.parametrize("flags", [
    dict(compute_dtype="bfloat16"),
    dict(compute_dtype="bfloat16", stack_critics=True, flat_optim=True),
])
def test_bf16_sac_learns_synthetic(flags):
    """The bf16 learner must still drive the critic loss down and keep all
    parameters finite over repeated updates on a fixed batch."""
    obs_dim, act_dim, b = 9, 4, 128
    cfg = sac.SACConfig(**flags)
    state = sac.sac_init(jax.random.key(10), obs_dim, act_dim, cfg)
    batch = _rand_batch(jax.random.key(11), b, obs_dim, act_dim)
    update = jax.jit(lambda s, k: sac.sac_update(s, k, batch, cfg))
    _, m0 = update(state, jax.random.key(0))
    for i in range(60):
        state, m = update(state, jax.random.key(i))
    assert float(m.critic_loss) < float(m0.critic_loss)
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(state.actor)
    )
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(state.critic)
    )


def test_population_super_step_with_fastpath_flags():
    """K=3 population smoke with every fast-path flag on (the exact config a
    bf16 wave runs): one warmup + one super-step, finite metrics."""
    from raptor_tpu.distill import population
    from raptor_tpu.env import EnvConfig, L2F

    env = L2F(EnvConfig())
    pop_cfg = population.PopulationConfig(
        n_teachers=3, envs_per_teacher=4, rollout_length=4,
        gradient_steps=2, batch_size=16, replay_capacity=64,
        warmup_super_steps=1,
    )
    sac_cfg = sac.SACConfig(
        compute_dtype="bfloat16", stack_critics=True, flat_optim=True
    )
    airframes = population.sample_teacher_airframes(jax.random.key(12), 3)
    states, env_params, run_cfg = population.population_init(
        jax.random.key(13), env, airframes, pop_cfg, sac_cfg
    )
    warmup = population.make_population_warmup(env, run_cfg)
    states = warmup(states, env_params)
    step = population.make_population_super_step(env, run_cfg, sac_cfg)
    states, metrics = step(states, env_params)
    assert bool(jnp.all(jnp.isfinite(metrics.critic_loss)))
    assert bool(jnp.all(jnp.isfinite(metrics.actor_loss)))
