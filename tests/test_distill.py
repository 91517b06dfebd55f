"""Foundation-recipe tests: population teacher training mechanics + the
distillation round loop (SURVEY §7 Stage 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.env import EnvConfig, InitConfig, L2F
from raptor_tpu.distill import population, post_training
from raptor_tpu.policy import network as student_net
from raptor_tpu.rl import networks, sac


@pytest.fixture(scope="module")
def env():
    return L2F(EnvConfig(episode_length=50))


def test_population_super_step(env):
    pop_cfg = population.PopulationConfig(
        n_teachers=4, envs_per_teacher=8, rollout_length=4, gradient_steps=4,
        batch_size=32, replay_capacity=64, warmup_super_steps=1,
    )
    sac_cfg = sac.SACConfig(actor_hidden=(16, 16), critic_hidden=(16, 16))
    airframes = population.sample_teacher_airframes(jax.random.key(0), 4)
    states, env_params, run_cfg = population.population_init(
        jax.random.key(1), env, airframes, pop_cfg, sac_cfg
    )
    warmup = population.make_population_warmup(env, run_cfg)
    super_step = population.make_population_super_step(env, run_cfg, sac_cfg)
    states = warmup(states, env_params)
    states, metrics = super_step(states, env_params)
    assert metrics.critic_loss.shape == (4,)
    assert np.all(np.isfinite(np.asarray(metrics.critic_loss)))
    assert int(states.total_env_steps[0]) == 8 * 4 * 2  # warmup + train collects

    evaluator = population.make_population_eval(env, 4, 20)
    stats = evaluator(states.sac, airframes, jax.random.split(jax.random.key(2), 4))
    assert stats.return_mean.shape == (4,)


def test_collect_shapes_and_hidden_reset(env):
    cfg = post_training.DistillConfig(envs_per_teacher=4, rollout_length=30)
    K = 3
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    env_params = population.broadcast_airframe_to_envs(airframes, 4)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    student = student_net.init_params(jax.random.key(2))
    collect = post_training.make_collect(env, cfg)
    data = collect(student, teachers, env_params, jax.random.key(3), 0.5)
    assert data.obs.shape == (30, 12, 22)
    assert data.teacher_action.shape == (30, 12, 4)
    assert data.reset.shape == (30, 12)
    assert np.all(np.isfinite(np.asarray(data.obs)))
    # teacher labels are mean-tanh actions => within (-1, 1)
    assert np.max(np.abs(np.asarray(data.teacher_action))) < 1.0


def test_bptt_loss_reset_masking():
    """With reset=1 everywhere, the loss equals per-step (h0) prediction."""
    student = student_net.init_params(jax.random.key(0))
    T, B = 5, 3
    obs = jax.random.normal(jax.random.key(1), (T, B, 22))
    label = jnp.zeros((T, B, 4))
    all_reset = jnp.ones((T, B))
    loss_reset = post_training.bptt_loss(student, obs, label, all_reset)
    # manual: every step from h0
    h0 = student_net.initial_hidden(student, B)
    preds = jnp.stack(
        [student_net.apply_step(student, h0, obs[t])[1] for t in range(T)]
    )
    expect = float(jnp.mean(preds**2))
    assert abs(float(loss_reset) - expect) < 1e-6
    # and differs from the no-reset (carried-hidden) loss
    loss_carry = post_training.bptt_loss(student, obs, label, jnp.zeros((T, B)))
    assert abs(float(loss_carry) - expect) > 1e-8


def test_distill_reduces_loss(env):
    """Student distills toward fixed teachers: loss decreases over rounds."""
    K = 2
    cfg = post_training.DistillConfig(
        envs_per_teacher=8,
        rollout_length=50,
        epochs_per_round=2,
        batch_size=8,
        teacher_mix_decay_rounds=2,
    )
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    losses_log = []
    student, history = post_training.distill(
        jax.random.key(2),
        env,
        teachers,
        airframes,
        cfg,
        n_rounds=4,
        log_fn=lambda tag, v, s: losses_log.append(v),
    )
    assert len(history) == 8  # 4 rounds x 2 epochs
    assert history[-1] < history[0] * 0.8, history
    assert np.all(np.isfinite(history))


def test_aggregate_reservoir_mechanics():
    """Appending fills in order; once full, columns are replaced in place."""
    cfg = post_training.DistillConfig(
        rollout_length=6, aggregate_capacity=10, grad_steps_per_round=2,
        batch_size=4,
    )
    agg = post_training.aggregate_init(cfg)
    add = post_training.make_aggregate_add(cfg)

    def round_data(val, B):
        return post_training.RoundData(
            obs=jnp.full((6, B, 22), val, jnp.float32),
            teacher_action=jnp.full((6, B, 4), val, jnp.float32),
            reset=jnp.zeros((6, B)),
        )

    agg = add(agg, round_data(1.0, 4), jax.random.key(0))
    assert int(agg.size) == 4
    agg = add(agg, round_data(2.0, 4), jax.random.key(1))
    assert int(agg.size) == 8
    obs = np.asarray(agg.obs[0, :, 0], np.float32)
    assert np.allclose(obs[:4], 1.0) and np.allclose(obs[4:8], 2.0)
    assert np.allclose(obs[8:], 0.0)
    # overflow: size caps at capacity, new data lands somewhere valid
    agg = add(agg, round_data(3.0, 4), jax.random.key(2))
    assert int(agg.size) == 10
    obs = np.asarray(agg.obs[0, :, 0], np.float32)
    assert np.any(obs == 3.0)
    assert not np.any(obs == 0.0) or int(agg.size) == 10


def test_distill_aggregated_reduces_loss(env):
    """Aggregation path: the student gets better at mimicking the teachers
    on a held-out teacher-rollout probe set; grad-step counter spans
    rounds x grad_steps_per_round."""
    K = 2
    cfg = post_training.DistillConfig(
        envs_per_teacher=8,
        rollout_length=50,
        batch_size=8,
        teacher_mix_decay_rounds=2,
        aggregate_capacity=128,
        grad_steps_per_round=16,
        total_grad_steps=64,
    )
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    # held-out probe: pure teacher rollouts (beta=1)
    env_params = population.broadcast_airframe_to_envs(airframes, 8)
    collect = post_training.make_collect(env, cfg)
    student0 = student_net.init_params(jax.random.key(2))
    probe = collect(student0, teachers, env_params, jax.random.key(99), 1.0)
    loss_before = float(post_training.bptt_loss(
        student0, probe.obs, probe.teacher_action, probe.reset
    ))
    steps_seen = []
    student, history = post_training.distill(
        jax.random.key(2),
        env,
        teachers,
        airframes,
        cfg,
        n_rounds=4,
        log_fn=lambda tag, v, s: steps_seen.append(s),
    )
    loss_after = float(post_training.bptt_loss(
        student, probe.obs, probe.teacher_action, probe.reset
    ))
    assert len(history) == 4  # one entry per round
    assert np.all(np.isfinite(history))
    assert loss_after < loss_before * 0.5, (loss_before, loss_after)
    assert max(steps_seen) >= 48  # grad-step counter spans rounds


def test_fold_norm_exact():
    """fold_norm(params)(raw obs) == params(normalized obs) — the folding
    identity that lets a standardize-trained student export as a plain
    reference-schema policy."""
    params = student_net.init_params(jax.random.key(0))
    mean = jax.random.normal(jax.random.key(1), (22,))
    std = jnp.abs(jax.random.normal(jax.random.key(2), (22,))) + 0.5
    obs = jax.random.normal(jax.random.key(3), (7, 22)) * 3.0 + 1.0
    h = student_net.initial_hidden(params, 7)
    h_a, a_a = student_net.apply_step(params, h, (obs - mean) / std)
    folded = student_net.fold_norm(params, mean, std)
    h_b, a_b = student_net.apply_step(folded, h, obs)
    np.testing.assert_allclose(np.asarray(a_a), np.asarray(a_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), atol=1e-5)


def test_distill_teachers_per_round(env):
    """Per-round teacher subsampling (VERDICT r2 item 1): each round's
    collected batch is K_sub x M sequences and the env-step counter grows by
    exactly T x K_sub x M."""
    K, K_sub, M, T = 6, 2, 4, 30
    cfg = post_training.DistillConfig(
        envs_per_teacher=M,
        rollout_length=T,
        teacher_mix_decay_rounds=2,
        aggregate_capacity=64,
        grad_steps_per_round=4,
        batch_size=8,
        teachers_per_round=K_sub,
    )
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    seen_steps = []
    student, history = post_training.distill(
        jax.random.key(2),
        env,
        teachers,
        airframes,
        cfg,
        n_rounds=3,
        round_hook=lambda r, s, steps: seen_steps.append(steps),
    )
    assert seen_steps == [T * K_sub * M * (i + 1) for i in range(3)]
    assert np.all(np.isfinite(history))


def test_distill_standardize_and_diagnostics(env):
    """standardize fits a round-0 normalizer, trains on normalized obs, and
    returns a FOLDED plain policy; diagnostics logs the decomposition tags
    (VERDICT r2 item 2)."""
    K = 2
    cfg = post_training.DistillConfig(
        envs_per_teacher=8,
        rollout_length=50,
        batch_size=8,
        teacher_mix_decay_rounds=2,
        aggregate_capacity=128,
        grad_steps_per_round=16,
        total_grad_steps=64,
        standardize=True,
        diagnostics=True,
    )
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    # held-out probe: pure teacher rollouts, RAW observations (the returned
    # student must be a plain folded policy needing no normalizer)
    env_params = population.broadcast_airframe_to_envs(airframes, 8)
    collect = post_training.make_collect(env, cfg)
    student0 = student_net.init_params(jax.random.key(2))
    probe = collect(student0, teachers, env_params, jax.random.key(99), 1.0)
    loss_before = float(post_training.bptt_loss(
        student0, probe.obs, probe.teacher_action, probe.reset
    ))
    tags = {}
    student, history = post_training.distill(
        jax.random.key(2),
        env,
        teachers,
        airframes,
        cfg,
        n_rounds=4,
        log_fn=lambda tag, v, s: tags.setdefault(tag, []).append(v),
    )
    assert np.all(np.isfinite(history))
    for t in ("diagnostics/loss_fresh", "diagnostics/mse_dim0",
              "diagnostics/mse_dim3", "diagnostics/teacher_disagreement"):
        assert t in tags and len(tags[t]) == 4 and np.all(np.isfinite(tags[t]))
    loss_after = float(post_training.bptt_loss(
        student, probe.obs, probe.teacher_action, probe.reset
    ))
    assert loss_after < loss_before * 0.5, (loss_before, loss_after)


def test_population_multi_step_equivalence(env):
    """N batched super-steps == N sequential super-steps (same RNG path)."""
    pop_cfg = population.PopulationConfig(
        n_teachers=2, envs_per_teacher=4, rollout_length=2, gradient_steps=2,
        batch_size=16, replay_capacity=32, warmup_super_steps=0,
    )
    sac_cfg = sac.SACConfig(actor_hidden=(8, 8), critic_hidden=(8, 8))
    airframes = population.sample_teacher_airframes(jax.random.key(0), 2)
    states, env_params, run_cfg = population.population_init(
        jax.random.key(1), env, airframes, pop_cfg, sac_cfg
    )
    single = population.make_population_super_step(env, run_cfg, sac_cfg)
    multi = population.make_population_multi_step(env, run_cfg, sac_cfg, 3)
    multi_unrolled = population.make_population_multi_step(
        env, run_cfg, sac_cfg, 3, unroll=True
    )

    # real buffer copies: all paths donate their inputs
    s_a = jax.tree.map(jnp.copy, states)
    s_c = jax.tree.map(jnp.copy, states)
    for _ in range(3):
        s_a, m_a = single(s_a, env_params)
    s_b, m_b = multi(states, env_params)
    s_c, m_c = multi_unrolled(s_c, env_params)
    for m_x in (m_b, m_c):
        assert np.allclose(
            np.asarray(m_a.critic_loss), np.asarray(m_x.critic_loss),
            atol=1e-5,
        )
    for s_x in (s_b, s_c):
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(s_a.sac.actor)[0]),
            np.asarray(jax.tree.leaves(s_x.sac.actor)[0]),
            atol=1e-6,
        )


def test_demo_label_injection(env):
    """Demonstration injection (MIGRATION §6 lever 1a): with demo_tilt set,
    collect states tilted beyond the threshold get the scripted recovery
    controller's action as their DAgger label; upright states keep the
    teacher label; demo_tilt=0 is bit-identical to the pure-teacher path."""
    from raptor_tpu.env.recovery import recovery_action, tilt_angle

    K, M = 2, 4
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    env_params = population.broadcast_airframe_to_envs(airframes, M)
    flat = jax.tree.map(
        lambda x: x.reshape((K * M,) + x.shape[2:]), env_params
    )
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    # default init is uniform-to-pi attitudes: a batch of resets spans the
    # threshold both ways
    es, obs = jax.vmap(env.reset)(
        jax.random.split(jax.random.key(3), K * M), flat
    )
    state = es.dynamics
    tilt = np.asarray(jax.vmap(tilt_angle)(state.orientation))
    thresh = float(np.median(tilt))  # guarantees rows on both sides
    assert (tilt > thresh).any() and (tilt <= thresh).any()

    lab_teacher = post_training.make_labeler(
        env, post_training.DistillConfig(demo_tilt=0.0)
    )(teachers, flat, obs, state)
    lab_demo = post_training.make_labeler(
        env, post_training.DistillConfig(demo_tilt=thresh)
    )(teachers, flat, obs, state)
    demo = jax.vmap(recovery_action)(flat, state)

    lab_teacher, lab_demo, demo = map(np.asarray, (lab_teacher, lab_demo, demo))
    severe = tilt > thresh
    np.testing.assert_allclose(lab_demo[severe], demo[severe], atol=1e-6)
    np.testing.assert_allclose(
        lab_demo[~severe], lab_teacher[~severe], atol=1e-6
    )
    # teacher path unchanged: matches a direct per-teacher actor_mean
    direct = jax.vmap(networks.actor_mean)(
        teachers, obs.reshape(K, M, -1)
    ).reshape(K * M, 4)
    np.testing.assert_allclose(lab_teacher, np.asarray(direct), atol=1e-6)
    # a very high threshold never fires
    lab_off = post_training.make_labeler(
        env, post_training.DistillConfig(demo_tilt=10.0)
    )(teachers, flat, obs, state)
    np.testing.assert_allclose(np.asarray(lab_off), lab_teacher, atol=0)

    # end-to-end: a collect round with injection jits and stays finite,
    # and at least one label differs from the pure-teacher round
    cfg = post_training.DistillConfig(
        envs_per_teacher=M, rollout_length=20, demo_tilt=1.0
    )
    data = post_training.make_collect(env, cfg)(
        student_net.init_params(jax.random.key(4)), teachers, env_params,
        jax.random.key(5), 0.5,
    )
    assert np.all(np.isfinite(np.asarray(data.teacher_action)))
    cfg0 = post_training.DistillConfig(
        envs_per_teacher=M, rollout_length=20, demo_tilt=0.0
    )
    data0 = post_training.make_collect(env, cfg0)(
        student_net.init_params(jax.random.key(4)), teachers, env_params,
        jax.random.key(5), 0.5,
    )
    assert not np.allclose(
        np.asarray(data.teacher_action), np.asarray(data0.teacher_action)
    )


def test_demo_gain_plumbing(env):
    """DistillConfig demonstrator gains reach the labeler (round 5,
    physics-pure mode): labels at severe states equal recovery_action
    with the SAME gains, and the physics-pure labels differ from the
    fixed-gain default on at least one severe state."""
    import functools

    from raptor_tpu.env.recovery import recovery_action, tilt_angle

    K, M = 2, 4
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    env_params = population.broadcast_airframe_to_envs(airframes, M)
    flat = jax.tree.map(
        lambda x: x.reshape((K * M,) + x.shape[2:]), env_params
    )
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    es, obs = jax.vmap(env.reset)(
        jax.random.split(jax.random.key(3), K * M), flat
    )
    state = es.dynamics
    tilt = np.asarray(jax.vmap(tilt_angle)(state.orientation))
    thresh = float(np.median(tilt))
    severe = tilt > thresh
    assert severe.any()

    pure = dict(demo_adaptive=True, demo_w_cap=999.0, demo_k_w=999.0,
                demo_c_flip=0.65, demo_c_lag=0.8, demo_c_bw=2.0)
    lab_pure = post_training.make_labeler(
        env, post_training.DistillConfig(demo_tilt=thresh, **pure)
    )(teachers, flat, obs, state)
    direct = jax.vmap(
        functools.partial(recovery_action, adaptive=True, w_cap=999.0,
                          k_w=999.0, c_flip=0.65, c_lag=0.8, c_bw=2.0)
    )(flat, state)
    np.testing.assert_allclose(
        np.asarray(lab_pure)[severe], np.asarray(direct)[severe], atol=1e-6
    )
    lab_fixed = post_training.make_labeler(
        env, post_training.DistillConfig(demo_tilt=thresh)
    )(teachers, flat, obs, state)
    assert not np.allclose(
        np.asarray(lab_pure)[severe], np.asarray(lab_fixed)[severe]
    )


def test_distill_student_hidden_ablation(env):
    """--student-hidden (capacity ablation, round 4): a non-default GRU
    width distills end-to-end, and the returned params carry the
    requested width everywhere (dense_0 out, GRU gates, dense_2 in)."""
    K = 2
    cfg = post_training.DistillConfig(
        envs_per_teacher=4,
        rollout_length=30,
        epochs_per_round=1,
        batch_size=4,
        teacher_mix_decay_rounds=1,
        student_hidden=24,
    )
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    student, history = post_training.distill(
        jax.random.key(2), env, teachers, airframes, cfg, n_rounds=2
    )
    assert student["dense_0"]["weights"].shape == (24, 22)
    assert student["gru_1"]["weights_input"].shape == (72, 24)
    assert student["gru_1"]["initial_hidden_state"].shape == (24,)
    assert student["dense_2"]["weights"].shape == (4, 24)
    assert np.all(np.isfinite(history))
    # the wide student steps like any other policy
    h = student_net.initial_hidden(student, 3)
    h, act = student_net.apply_step(student, h, jnp.zeros((3, 22)))
    assert act.shape == (3, 4) and h.shape == (3, 24)


def test_demo_rollout_frac_drives_expert_envs(env):
    """demo_rollout_frac routes the first d envs of each teacher block to
    the scripted demonstrator: their collected trajectories change, the
    student/teacher-driven envs' do not (round-5 coverage fix for the null
    demo640 measurement, VERDICT r4 item 1)."""
    K, M = 2, 4
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    env_params = population.broadcast_airframe_to_envs(airframes, M)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    student = student_net.init_params(jax.random.key(2))
    base = dict(envs_per_teacher=M, rollout_length=25, demo_tilt=1.2)
    data0 = post_training.make_collect(
        env, post_training.DistillConfig(**base)
    )(student, teachers, env_params, jax.random.key(3), 0.0)
    data1 = post_training.make_collect(
        env, post_training.DistillConfig(**base, demo_rollout_frac=0.5)
    )(student, teachers, env_params, jax.random.key(3), 0.0)
    o0, o1 = np.asarray(data0.obs), np.asarray(data1.obs)
    # env index within each block: [0,1] demo-driven, [2,3] student-driven
    demo_rows = [(k * M + j) for k in range(K) for j in range(2)]
    other_rows = [(k * M + j) for k in range(K) for j in range(2, M)]
    assert not np.allclose(o0[:, demo_rows], o1[:, demo_rows])
    np.testing.assert_allclose(o0[:, other_rows], o1[:, other_rows])
    assert np.all(np.isfinite(o1))
    assert np.all(np.isfinite(np.asarray(data1.teacher_action)))


def test_severe_weighted_bptt_loss():
    """severe_weight reweights exactly the frames whose stored R22 channel
    says tilt > severe_tilt; weight 1 reproduces the plain MSE."""
    student = student_net.init_params(jax.random.key(0))
    T, B = 6, 4
    obs = jax.random.normal(jax.random.key(1), (T, B, 22)) * 0.1
    # force a known severe pattern in the R22 channel: first half of the
    # timesteps upright (R22=1), second half inverted (R22=-1)
    r22 = jnp.concatenate(
        [jnp.ones((T // 2, B)), -jnp.ones((T - T // 2, B))], axis=0
    )
    obs = obs.at[..., post_training._R22].set(r22)
    label = jnp.zeros((T, B, 4))
    reset = jnp.ones((T, B))
    plain = post_training.bptt_loss(student, obs, label, reset)
    same = post_training.bptt_loss(
        student, obs, label, reset, severe_weight=1.0, severe_tilt=1.2
    )
    assert float(plain) == float(same)
    # manual weighted expectation
    actions = post_training.bptt_actions(student, obs, reset)
    err2 = np.asarray((actions - label) ** 2)
    sev = np.asarray(post_training.severe_mask(obs, 1.2)).astype(float)
    w = np.where(sev > 0, 8.0, 1.0)
    expect = (err2 * w[..., None]).sum() / (w.sum() * 4.0)
    got = float(post_training.bptt_loss(
        student, obs, label, reset, severe_weight=8.0, severe_tilt=1.2
    ))
    assert abs(got - expect) < 1e-6
    assert abs(got - float(plain)) > 1e-9


def test_diagnostics_severe_instrumentation(env):
    """The fresh-round probe reports the demo-injection instrumentation:
    severe_frac in [0,1] consistent with a direct count, and the
    severe/hover loss split recombines to the overall probe loss."""
    K, M = 2, 4
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    env_params = population.broadcast_airframe_to_envs(airframes, M)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    student = student_net.init_params(jax.random.key(2))
    cfg = post_training.DistillConfig(envs_per_teacher=M, rollout_length=25)
    data = post_training.make_collect(env, cfg)(
        student, teachers, env_params, jax.random.key(3), 1.0
    )
    fresh, _ = post_training.make_diagnostics(env, probe_cols=K * M,
                                              severe_tilt=1.0)
    out = jax.tree.map(np.asarray, fresh(student, data))
    direct = np.asarray(
        post_training.severe_mask(data.obs, 1.0)
    ).astype(float).mean()
    assert abs(float(out["severe_frac"]) - direct) < 1e-6
    assert 0.0 <= float(out["severe_frac"]) <= 1.0
    sev = float(out["severe_frac_probe"])
    recombined = sev * float(out["loss_severe"]) + (1 - sev) * float(
        out["loss_hover"]
    )
    assert abs(recombined - float(out["loss_fresh"])) < 1e-5


def test_population_demo_collect_seeds_replay(env):
    """DDPGfD seeding (MIGRATION §6 lever 1b): a demonstrator collect
    writes H finite rows of scripted actions into every teacher's replay
    ring and advances the env/step bookkeeping."""
    pop_cfg = population.PopulationConfig(
        n_teachers=2, envs_per_teacher=4, rollout_length=4, gradient_steps=2,
        batch_size=16, replay_capacity=32, warmup_super_steps=1,
    )
    sac_cfg = sac.SACConfig(actor_hidden=(16, 16), critic_hidden=(16, 16))
    airframes = population.sample_teacher_airframes(jax.random.key(0), 2)
    states, env_params, run_cfg = population.population_init(
        jax.random.key(1), env, airframes, pop_cfg, sac_cfg
    )
    demo = population.make_population_demo_collect(env, run_cfg,
                                                   adaptive=True)
    states = demo(states, env_params)
    assert int(states.buffer.size[0]) == 4
    assert int(states.total_env_steps[0]) == 4 * 4
    a = np.asarray(states.buffer.action)[:, :4]  # filled rows
    assert np.all(np.isfinite(a)) and np.all(np.abs(a) <= 1.0)
    # and the subsequent SAC train step still works on the seeded ring
    states, metrics = population.make_population_super_step(
        env, run_cfg, sac_cfg
    )(states, env_params)
    assert np.all(np.isfinite(np.asarray(metrics.critic_loss)))


def test_demo_rate_label_criterion(env):
    """demo_rate extends demo labeling to upright-but-fast states (the
    demonstrator's arrest phase): a state with tilt < demo_tilt but |w| >
    demo_rate takes the demo label; slow upright states keep the teacher's
    (round-5 demoDiag diagnosis)."""
    from raptor_tpu.env.recovery import recovery_action

    K, M = 2, 4
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    env_params = population.broadcast_airframe_to_envs(airframes, M)
    flat = jax.tree.map(lambda x: x.reshape((K * M,) + x.shape[2:]), env_params)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (16, 16))
    )(jax.random.split(jax.random.key(1), K))
    # upright states, half slow / half spinning at 8 rad/s
    es, obs = jax.vmap(env.reset)(
        jax.random.split(jax.random.key(3), K * M), flat
    )
    st = es.dynamics
    upright = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0, 0.0]), st.orientation.shape
    )
    w = jnp.zeros_like(st.angular_velocity)
    w = w.at[::2, 0].set(8.0)  # even rows spin fast
    st = st.replace(orientation=upright, angular_velocity=w,
                    position=jnp.zeros_like(st.position))
    # rebuild obs consistent with the modified state
    obs = jax.vmap(env.observe_full)(flat, st) if hasattr(env, "observe_full") \
        else obs
    lab_tilt_only = post_training.make_labeler(
        env, post_training.DistillConfig(demo_tilt=1.2)
    )(teachers, flat, obs, st)
    lab_rate = post_training.make_labeler(
        env, post_training.DistillConfig(demo_tilt=1.2, demo_rate=5.0)
    )(teachers, flat, obs, st)
    demo = jax.vmap(recovery_action)(flat, st)
    lab_tilt_only, lab_rate, demo = map(
        np.asarray, (lab_tilt_only, lab_rate, demo)
    )
    # fast rows take the demo label under the rate criterion
    np.testing.assert_allclose(lab_rate[::2], demo[::2], atol=1e-6)
    # slow upright rows keep the teacher label in both modes
    np.testing.assert_allclose(lab_rate[1::2], lab_tilt_only[1::2], atol=1e-6)
    # tilt-only mode never fires on upright states
    assert not np.allclose(lab_tilt_only[::2], demo[::2])
