"""TD3 + PPO mechanics, standardize layer, and the composable loop steps."""

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.env import EnvConfig, L2F, presets, sample_population
from raptor_tpu.rl import loop, networks, ppo, td3


def test_td3_update_and_policy_delay():
    state = td3.td3_init(jax.random.key(0), 5, 2)
    batch = (
        jnp.ones((32, 5)), jnp.zeros((32, 2)), jnp.ones((32,)),
        jnp.ones((32, 5)), jnp.zeros((32,)),
    )
    upd = jax.jit(td3.td3_update)
    s1, m1 = upd(state, jax.random.key(1), batch)
    # step 0: policy updates (0 % 2 == 0)
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.actor, s1.actor)))
    assert moved > 0
    # step 1: delayed — actor frozen
    s2, m2 = upd(s1, jax.random.key(2), batch)
    frozen = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.actor, s2.actor)))
    assert frozen == 0.0
    assert np.isfinite(float(m2.critic_loss))


def test_ppo_iteration_on_env():
    env = L2F(EnvConfig())
    cfg = ppo.PPOConfig(rollout_length=8, n_epochs=2, n_minibatches=2,
                        actor_hidden=(16, 16), value_hidden=(16, 16))
    n = 8
    params = sample_population(jax.random.key(0), n)
    state = ppo.ppo_init(jax.random.key(1), env.OBSERVATION_DIM, 4, cfg)
    v_reset, _ = env.vector_ops()
    es, obs = v_reset(jax.random.split(jax.random.key(2), n), params)
    it = ppo.make_ppo_iteration(env, cfg)
    key = jax.random.key(3)
    state, es, obs, key, metrics = it(state, params, es, obs, key)
    state, es, obs, key, metrics = it(state, params, es, obs, key)
    assert int(state.step) == 2
    for m in metrics:
        assert np.isfinite(float(m))


def test_gae_against_manual():
    """GAE as implemented in ppo_rollout (bootstrap from V(final_obs), cut
    only by true termination; accumulator cut at any boundary) matches a
    manual backward pass."""
    cfg = ppo.PPOConfig(gamma=0.9, gae_lambda=0.8)
    T, N = 4, 1
    value = jnp.asarray([[1.0], [2.0], [3.0], [4.0]])
    reward = jnp.asarray([[1.0], [1.0], [1.0], [1.0]])
    terminated = jnp.asarray([[0.0], [1.0], [0.0], [0.0]])
    done = jnp.asarray([[0.0], [1.0], [0.0], [1.0]])  # t=3 truncated
    v_next = jnp.asarray([[2.0], [9.9], [4.0], [5.0]])  # V(final_obs_t)

    def gae_body(gae, inp):
        v, r, d, term, vn = inp
        delta = r + cfg.gamma * vn * (1 - term) - v
        gae = delta + cfg.gamma * cfg.gae_lambda * (1 - d) * gae
        return gae, gae

    _, adv = jax.lax.scan(
        gae_body, jnp.zeros_like(value[0]),
        (value, reward, done, terminated, v_next), reverse=True)

    expect = np.zeros((T, N))
    gae = 0.0
    for t in reversed(range(T)):
        d, term = float(done[t, 0]), float(terminated[t, 0])
        delta = (
            float(reward[t, 0])
            + cfg.gamma * float(v_next[t, 0]) * (1 - term)
            - float(value[t, 0])
        )
        gae = delta + cfg.gamma * cfg.gae_lambda * (1 - d) * gae
        expect[t, 0] = gae
    np.testing.assert_allclose(np.asarray(adv), expect, atol=1e-6)
    # truncation at t=3 still bootstraps: advantage includes gamma*v_next
    assert abs(expect[3, 0] - (1.0 + 0.9 * 5.0 - 4.0)) < 1e-6
    # termination at t=1 does not bootstrap
    assert abs(expect[1, 0] - (1.0 - 2.0)) < 1e-6


def test_standardize_fold():
    std = {"mean": jnp.asarray([1.0, -2.0]), "std": jnp.asarray([2.0, 0.5])}
    dense = {"w": jnp.asarray([[1.0, 0.5], [-0.3, 2.0]]), "b": jnp.asarray([0.1, -0.1])}
    x = jnp.asarray([[0.7, 1.3]])
    direct = networks.standardize_apply(std, x) @ dense["w"] + dense["b"]
    folded = networks.fold_standardize_into_dense(std, dense)
    fused = x @ folded["w"] + folded["b"]
    np.testing.assert_allclose(np.asarray(direct), np.asarray(fused), atol=1e-6)


def test_loop_steps_cadence(tmp_path):
    from raptor_tpu.utils.extrack import Run

    calls = {"eval": 0, "ckpt": 0}

    def fake_super_step(state, params):
        return state + 1, {"loss": 1.0}

    def fake_eval(state):
        calls["eval"] += 1
        return {"return/mean": 10.0}

    def fake_save(state, step):
        calls["ckpt"] += 1

    run = Run(base_dir=str(tmp_path), experiment="loop-test")
    holder = loop.StateHolder(state=0, env_steps_per_iter=100)
    training_loop = loop.Loop(
        loop.CoreStep(fake_super_step, params=None),
        loop.EvaluationStep(fake_eval, every_env_steps=300),
        loop.CheckpointStep(fake_save, every_env_steps=500),
        loop.TimingStep(log_every_iters=2),
        extrack_run=run,
    )
    training_loop.run_until(holder, 1000)
    run.close()
    assert holder.state == 10  # 10 core iterations
    assert calls["eval"] == 3  # at 300, 600, 900
    assert calls["ckpt"] == 2  # at 500, 1000
