"""Recurrent SAC: BPTT update mechanics + sequence runner integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.env import EnvConfig, L2F, sample_population
from raptor_tpu.rl import runner_gru, sac_gru


def _fake_batch(key, B=4, T=8, obs_dim=22, act_dim=4):
    ks = jax.random.split(key, 5)
    return {
        "obs": jax.random.normal(ks[0], (B, T, obs_dim)),
        "action": jnp.tanh(jax.random.normal(ks[1], (B, T, act_dim))),
        "reward": jax.random.normal(ks[2], (B, T)),
        "done": jnp.zeros((B, T)),
        "reset": (jax.random.uniform(ks[3], (B, T)) < 0.1).astype(jnp.float32),
        "env_idx": jnp.zeros((B,), jnp.int32),
    }


def test_sac_gru_update_moves_params():
    state = sac_gru.sac_gru_init(jax.random.key(0), 22, 4)
    batch = _fake_batch(jax.random.key(1))
    new_state, metrics = jax.jit(sac_gru.sac_gru_update)(
        state, jax.random.key(2), batch
    )
    assert int(new_state.step) == 1
    for m in metrics:
        assert np.isfinite(float(m))
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.actor, new_state.actor
    )
    assert max(jax.tree.leaves(moved)) > 0.0


def test_actor_backbone_matches_foundation_topology():
    """The recurrent actor backbone has the foundation policy's shapes
    (Dense 22->16, GRU 16) with a 8-dim Gaussian head."""
    state = sac_gru.sac_gru_init(jax.random.key(0), 22, 4)
    a = state.actor
    assert a["dense_0"]["weights"].shape == (16, 22)
    assert a["gru_1"]["weights_input"].shape == (48, 16)
    assert a["dense_2"]["weights"].shape == (8, 16)


def test_boundary_masking_excludes_cross_episode_targets():
    """A reward spike right before an episode boundary must not leak into
    the critic loss when the boundary is masked."""
    state = sac_gru.sac_gru_init(jax.random.key(0), 6, 2)
    B, T = 2, 6
    base = _fake_batch(jax.random.key(1), B=B, T=T, obs_dim=6, act_dim=2)
    base["reset"] = jnp.zeros((B, T))
    # episode boundary at t=3 for batch row 0
    b1 = dict(base, reset=base["reset"].at[0, 3].set(1.0))
    # gigantic reward at the transition INTO the boundary (t=2 -> t=3)
    b1_spiked = dict(b1, reward=b1["reward"].at[0, 2].set(1e6))

    def critic_loss_of(batch):
        _, metrics = sac_gru.sac_gru_update(state, jax.random.key(3), batch)
        return float(metrics.critic_loss)

    # the spiked reward sits on a masked transition: loss unchanged
    assert abs(critic_loss_of(b1) - critic_loss_of(b1_spiked)) < 1e-3
    # but the same spike on a valid transition changes the loss massively
    b2_spiked = dict(base, reward=base["reward"].at[0, 4].set(1e6))
    assert abs(critic_loss_of(base) - critic_loss_of(b2_spiked)) > 1e6


def test_gru_runner_super_step():
    env = L2F(EnvConfig())
    run_cfg = runner_gru.GRURunnerConfig(
        n_envs=8, rollout_length=8, gradient_steps=2, batch_size=4,
        sample_seq_len=8, replay_capacity=64,
    )
    cfg = sac_gru.SACGRUConfig()
    params = sample_population(jax.random.key(0), run_cfg.n_envs)
    state = runner_gru.gru_trainer_init(jax.random.key(1), env, params, run_cfg, cfg)
    super_step = runner_gru.make_gru_super_step(env, run_cfg, cfg)
    state, metrics = super_step(state, params)
    state, metrics = super_step(state, params)
    assert np.isfinite(float(metrics.critic_loss))
    assert int(state.total_env_steps) == 2 * 8 * 8
    assert int(state.buffer.size) == 16
    # hidden carried across the super-step boundary
    assert state.hidden.shape == (8, 16)


def test_gru_runner_privileged_critics():
    """Asymmetric mode: critics consume the full privileged obs, the actor
    (and its export surface) stays on the 22-dim policy slice."""
    env = L2F(EnvConfig())
    run_cfg = runner_gru.GRURunnerConfig(
        n_envs=8, rollout_length=8, gradient_steps=2, batch_size=4,
        sample_seq_len=8, replay_capacity=64,
    )
    cfg = sac_gru.SACGRUConfig(
        actor_obs_dim=run_cfg.actor_obs_dim, critic_hidden_dim=32
    )
    params = sample_population(jax.random.key(0), run_cfg.n_envs)
    state = runner_gru.gru_trainer_init(jax.random.key(1), env, params, run_cfg, cfg)
    # actor input = policy slice; critic input = full obs + action
    assert state.learner.actor["dense_0"]["weights"].shape[1] == 22
    assert (
        state.learner.critic1["dense_0"]["weights"].shape[1]
        == env.OBSERVATION_DIM + env.ACTION_DIM
    )
    # critic wider than the deployable actor
    assert state.learner.critic1["gru_1"]["initial_hidden_state"].shape[-1] == 32
    assert state.learner.actor["gru_1"]["initial_hidden_state"].shape[-1] == 16
    super_step = runner_gru.make_gru_super_step(env, run_cfg, cfg)
    state, metrics = super_step(state, params)
    state, metrics = super_step(state, params)
    for m in metrics:
        assert np.isfinite(float(m))


@pytest.mark.slow
def test_sac_gru_learns_hover():
    """Recurrent SAC improves eval return on fixed crazyflie hover."""
    from raptor_tpu.env import EnvConfig, InitConfig, presets
    from raptor_tpu.policy import network as gru_net
    from raptor_tpu.rl import evaluation
    import pytest  # noqa: F811

    env = L2F(EnvConfig(
        episode_length=100,
        init=InitConfig(position_range=0.1, max_angle=0.3,
                        linear_velocity_std=0.05, angular_velocity_std=0.05)))
    run_cfg = runner_gru.GRURunnerConfig(
        n_envs=32, rollout_length=25, gradient_steps=8,
        batch_size=16, sample_seq_len=25, replay_capacity=2048)
    cfg = sac_gru.SACGRUConfig()
    params1 = presets.crazyflie()
    params = jax.tree.map(lambda x: jnp.broadcast_to(x, (32,) + x.shape), params1)
    state = runner_gru.gru_trainer_init(jax.random.key(0), env, params, run_cfg, cfg)
    step = runner_gru.make_gru_super_step(env, run_cfg, cfg)

    def ev(learner):
        m = 16
        pe = jax.tree.map(lambda x: jnp.broadcast_to(x, (m,) + x.shape), params1)
        sf = sac_gru.recurrent_actor_step(learner.actor, cfg)
        stats = evaluation.evaluate(
            env, pe, lambda h, o: sf(h, o[..., :22]),
            gru_net.initial_hidden(learner.actor, m), jax.random.key(7), m, 100)
        return float(stats.return_mean)

    before = ev(state.learner)
    for _ in range(100):
        state, metrics = step(state, params)
    after = ev(state.learner)
    assert np.isfinite(after)
    assert after > before + 15.0, f"no learning: {before} -> {after}"


def test_burn_in_masks_losses_but_warms_hidden():
    """burn_in steps contribute NO loss (rewards there are irrelevant) while
    still warming up the hidden state (VERDICT r1 weak #4 fix)."""
    cfg = sac_gru.SACGRUConfig(burn_in=4)
    state = sac_gru.sac_gru_init(jax.random.key(0), 22, 4, cfg)
    b1 = _fake_batch(jax.random.key(1), B=4, T=12)
    # corrupt ONLY the rewards inside the burn-in window (transitions
    # t<4); they must not influence the update in any way
    b2 = dict(b1, reward=b1["reward"].at[:, :4].add(1e3))
    s1, m1 = sac_gru.sac_gru_update(state, jax.random.key(2), b1, cfg)
    s2, m2 = sac_gru.sac_gru_update(state, jax.random.key(2), b2, cfg)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1.critic_loss) == float(m2.critic_loss)

    # ...but burn-in OBS still matter (hidden warm-up): corrupting them
    # changes the post-burn-in predictions and hence the update
    b3 = dict(b1, obs=b1["obs"].at[:, :4].add(3.0),
              reset=jnp.zeros_like(b1["reset"]))
    b1nr = dict(b1, reset=jnp.zeros_like(b1["reset"]))
    s3, m3 = sac_gru.sac_gru_update(state, jax.random.key(2), b3, cfg)
    s1nr, m1nr = sac_gru.sac_gru_update(state, jax.random.key(2), b1nr, cfg)
    assert float(m3.critic_loss) != float(m1nr.critic_loss)

    # burn_in=0 keeps the legacy behavior: rewards at t<4 DO matter
    cfg0 = sac_gru.SACGRUConfig(burn_in=0)
    s4, m4 = sac_gru.sac_gru_update(state, jax.random.key(2), b1, cfg0)
    s5, m5 = sac_gru.sac_gru_update(state, jax.random.key(2), b2, cfg0)
    assert float(m4.critic_loss) != float(m5.critic_loss)


def test_graft_actor_from_student_matches_tanh_of_student():
    """RL fine-tuning init (MIGRATION §6 lever 4): the grafted actor's
    deterministic action tanh(mu) equals tanh(student raw output) at every
    state, and the initial policy std is exp(init_log_std) everywhere."""
    import numpy as np

    from raptor_tpu.policy import network as gru_net

    cfg = sac_gru.SACGRUConfig()
    learner = sac_gru.sac_gru_init(jax.random.key(0), 22, 4, cfg)
    student = gru_net.init_params(jax.random.key(1))
    actor = sac_gru.graft_actor_from_student(learner.actor, student, 4,
                                             init_log_std=-2.0)
    T, B = 7, 3
    obs = jax.random.normal(jax.random.key(2), (T, B, 22)) * 0.5
    reset = jnp.zeros((T, B)).at[0].set(1.0)
    mu, log_std = sac_gru.actor_forward(actor, obs, reset, cfg)
    # student forward over the same sequence
    h = gru_net.initial_hidden(student, B)
    outs = []
    for t in range(T):
        h, a = gru_net.apply_step(student, h, obs[t])
        outs.append(a)
    raw = jnp.stack(outs)
    np.testing.assert_allclose(
        np.asarray(jnp.tanh(mu)), np.asarray(jnp.tanh(raw)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(log_std), -2.0, atol=1e-6)
