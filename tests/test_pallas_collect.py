"""Parity tests for the fused DAgger-collect kernel (ops/pallas_collect.py)
against the XLA env/policy path — interpret mode on CPU (CLAUDE.md rule).

Covers: (1) exact closed-loop trajectory parity with the XLA path while no
resets occur, (2) auto-reset semantics (termination + per-env truncation,
fresh-state ranges, hidden/action-history restart), (3) the in-kernel
sampler's distribution vs InitConfig, (4) the batched relabel pass vs
per-step teacher labels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.distill import post_training
from raptor_tpu.env import EnvConfig, L2F, sample_population
from raptor_tpu.env.types import InitConfig, TerminationConfig
from raptor_tpu.ops.pallas_collect import make_fused_collect
from raptor_tpu.policy import network as student_net
from raptor_tpu.rl import networks

N = 1024  # one full lane tile — no padded lanes in the comparison


def _setup(env, n=N, seed=0):
    key = jax.random.key(seed)
    k_pop, k_reset = jax.random.split(key)
    frames = sample_population(k_pop, 8)
    params = jax.tree.map(lambda x: jnp.repeat(x, n // 8, axis=0), frames)
    es, obs0 = jax.vmap(env.reset, in_axes=(0, 0))(
        jax.random.split(k_reset, n), params
    )
    student = student_net.init_params(jax.random.key(7))
    return params, es, obs0, student


def _xla_rollout(env, student, params, es, obs0, n_steps):
    """Reference trajectory: the make_collect body at beta=0 (student-only)."""
    _, v_step = env.vector_ops()
    h0 = student_net.initial_hidden(student, obs0.shape[0])

    def body(carry, _):
        es, obs, h = carry
        h2, a = student_net.apply_step(student, h, obs[..., :22])
        a = jnp.clip(a, -1.0, 1.0)
        es2, obs2, _, done, _ = v_step(params, es, a)
        reset = done.astype(jnp.float32)
        h2 = jnp.where(reset[:, None], h0, h2)
        return (es2, obs2, h2), (obs[..., :22], reset)

    _, (obs_seq, reset_seq) = jax.lax.scan(
        body, (es, obs0, h0), None, length=n_steps
    )
    return obs_seq, reset_seq


def test_trajectory_parity_no_resets():
    """Gentle init + wide bounds: no terminations, so both paths are fully
    deterministic from the same initial state — sequences must match."""
    cfg = EnvConfig(
        init=InitConfig(max_angle=0.2, linear_velocity_std=0.02,
                        angular_velocity_std=0.02),
        termination=TerminationConfig(position_bound=50.0,
                                      angular_velocity_bound=1000.0),
        episode_length=500,
    )
    env = L2F(cfg)
    params, es, obs0, student = _setup(env)
    T = 20
    run = make_fused_collect(student, T, cfg, chunk=5)
    obs_f, reset_f = run(params, es.dynamics, 3)
    obs_x, reset_x = _xla_rollout(env, student, params, es, obs0, T)
    assert float(jnp.max(jnp.abs(reset_f - reset_x))) == 0.0
    assert float(jnp.sum(reset_x)) == 0.0  # sanity: really no resets
    err = float(jnp.max(jnp.abs(obs_f - obs_x)))
    assert err < 2e-4, f"fused vs XLA obs mismatch: {err}"


def test_auto_reset_termination_and_truncation():
    """Tight angular-velocity bound + short per-env episodes: the kernel must
    reset exactly where the XLA env does while trajectories coincide, and
    post-reset observations must come from the init distribution."""
    cfg = EnvConfig(
        init=InitConfig(max_angle=0.3, position_range=0.1,
                        linear_velocity_std=0.02, angular_velocity_std=0.02),
        episode_length=8,  # per-env truncation inside the rollout
    )
    env = L2F(cfg)
    params, es, obs0, student = _setup(env)
    T = 20
    run = make_fused_collect(student, T, cfg, chunk=5)
    obs_f, reset_f = run(params, es.dynamics, 11)
    reset_f = np.asarray(reset_f)
    obs_f = np.asarray(obs_f)

    # truncation cadence: every env truncates at steps 7 and 15 unless it
    # terminated first (which re-phases it) — with gentle init and the
    # default bounds, terminations are rare; require the vast majority on
    # the truncation grid
    assert reset_f[7].mean() > 0.9
    assert reset_f[15].mean() > 0.9

    # post-reset rows: obs directly after a reset must be freshly sampled
    t, e = np.nonzero(reset_f[:-1])
    after = obs_f[t + 1, e]  # [R, 22]
    assert after.shape[0] > 0
    assert np.all(np.abs(after[:, 0:3]) <= cfg.init.position_range + 1e-6)
    # action history restarts at zero
    assert np.max(np.abs(after[:, 18:22])) == 0.0
    # rotation matrix rows orthonormal and within max_angle of identity
    R = after[:, 3:12].reshape(-1, 3, 3)
    eye = np.einsum("nij,nkj->nik", R, R)
    assert np.max(np.abs(eye - np.eye(3))) < 1e-4
    tr = np.einsum("nii->n", R)
    angle = np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    assert np.max(angle) <= cfg.init.max_angle + 1e-4


def test_in_kernel_sampler_distribution():
    """episode_length=1 makes every step a fresh sample: check the in-kernel
    PRNG reproduces the InitConfig ranges/moments."""
    cfg = EnvConfig(
        init=InitConfig(max_angle=2.0, position_range=0.25,
                        linear_velocity_std=0.15, angular_velocity_std=0.1),
        episode_length=1,
    )
    env = L2F(cfg)
    params, es, obs0, student = _setup(env)
    T = 10
    run = make_fused_collect(student, T, cfg, chunk=5)
    obs_f, reset_f = run(params, es.dynamics, 5)
    obs = np.asarray(obs_f)[2:]  # skip t<2: t=0 is the XLA-sampled state
    obs = obs.reshape(-1, 22)
    pos = obs[:, 0:3]
    assert np.all(np.abs(pos) <= cfg.init.position_range + 1e-6)
    assert abs(pos.mean()) < 0.01  # uniform, zero-mean
    # uniform(-a, a) std = a/sqrt(3)
    assert abs(pos.std() - cfg.init.position_range / np.sqrt(3)) < 0.01
    vel = obs[:, 12:15]
    assert abs(vel.std() - cfg.init.linear_velocity_std) < 0.02
    assert abs(vel.mean()) < 0.01
    R = obs[:, 3:12].reshape(-1, 3, 3)
    tr = np.einsum("nii->n", R)
    angle = np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    assert np.max(angle) <= cfg.init.max_angle + 1e-3
    assert angle.mean() > 0.5  # actually spread over the range


def test_in_kernel_sampler_angle_power_bias():
    """angle_power>1 (init-severity curriculum) must shift the in-kernel
    attitude draw toward max_angle: E[u^(1/3)] = 0.75 vs E[u] = 0.5."""
    base = dict(max_angle=2.0, position_range=0.25,
                linear_velocity_std=0.15, angular_velocity_std=0.1)

    def mean_angle(power):
        cfg = EnvConfig(init=InitConfig(angle_power=power, **base),
                        episode_length=1)
        env = L2F(cfg)
        params, es, obs0, student = _setup(env)
        run = make_fused_collect(student, 10, cfg, chunk=5)
        obs_f, _ = run(params, es.dynamics, 5)
        obs = np.asarray(obs_f)[2:].reshape(-1, 22)
        R = obs[:, 3:12].reshape(-1, 3, 3)
        tr = np.einsum("nii->n", R)
        return np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)).mean()

    m1, m3 = mean_angle(1.0), mean_angle(3.0)
    assert abs(m1 - 0.5 * base["max_angle"]) < 0.1
    assert abs(m3 - 0.75 * base["max_angle"]) < 0.1


def test_xla_sampler_angle_power_bias():
    """The XLA-path sampler (maths.random_quaternion) applies the same
    severity shaping as the kernel."""
    from raptor_tpu.env import maths

    def mean_angle(power):
        keys = jax.random.split(jax.random.key(0), 2048)
        qs = jax.vmap(lambda k: maths.random_quaternion(k, 2.0, power))(keys)
        w = np.clip(np.abs(np.asarray(qs)[:, 0]), -1.0, 1.0)
        return (2.0 * np.arccos(w)).mean()

    assert abs(mean_angle(1.0) - 1.0) < 0.05
    assert abs(mean_angle(3.0) - 1.5) < 0.05


def test_relabel_matches_per_step_teacher_labels():
    """make_relabel (batched MXU pass) == make_collect's per-step labels."""
    env = L2F(EnvConfig())
    K, M, T = 4, 2, 6
    key = jax.random.key(3)
    frames = sample_population(jax.random.fold_in(key, 0), K)
    obs_dim = env.OBSERVATION_DIM
    actors = [
        networks.actor_init(jax.random.fold_in(key, i), obs_dim, 4)
        for i in range(K)
    ]
    teacher_actors = jax.tree.map(lambda *xs: jnp.stack(xs), *actors)
    flat_params = jax.tree.map(lambda x: jnp.repeat(x, M, axis=0), frames)
    obs22 = jax.random.normal(jax.random.fold_in(key, 9), (T, K * M, 22))

    relabel = post_training.make_relabel(env)
    got = relabel(teacher_actors, flat_params, obs22)

    tail = jax.vmap(env.privileged_tail)(flat_params)  # [K*M, 9]
    full = jnp.concatenate(
        [obs22, jnp.broadcast_to(tail[None], (T, K * M, 9))], axis=-1
    )
    obs_k = full.reshape(T, K, M, obs_dim)
    want = jax.vmap(
        lambda a, o: networks.actor_mean(a, o), in_axes=(0, 1), out_axes=1
    )(teacher_actors, obs_k).reshape(T, K * M, 4)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-6


def test_fused_collect_round_shapes():
    """fused_collect_round produces a RoundData usable by the trainer."""
    env = L2F(EnvConfig(episode_length=10))
    K, M = 4, 2
    key = jax.random.key(1)
    frames = sample_population(jax.random.fold_in(key, 0), K)
    obs_dim = env.OBSERVATION_DIM
    actors = [
        networks.actor_init(jax.random.fold_in(key, i), obs_dim, 4)
        for i in range(K)
    ]
    teacher_actors = jax.tree.map(lambda *xs: jnp.stack(xs), *actors)
    env_params = jax.tree.map(
        lambda x: jnp.repeat(x[:, None], M, axis=1), frames
    )
    student = student_net.init_params(jax.random.key(2))
    cfg = post_training.DistillConfig(
        envs_per_teacher=M, rollout_length=10
    )
    data = post_training.fused_collect_round(
        student, teacher_actors, env_params, key, env, cfg,
        post_training.make_relabel(env), seed=0,
    )
    assert data.obs.shape == (10, K * M, 22)
    assert data.teacher_action.shape == (10, K * M, 4)
    assert data.reset.shape == (10, K * M)
    assert bool(jnp.all(jnp.isfinite(data.obs)))
    assert bool(jnp.all(jnp.abs(data.teacher_action) <= 1.0))


def test_fused_collect_shards_over_env_axis():
    """The collect kernel runs under shard_map on an env-sharded mesh with
    per-device blocks (multi-chip pipeline path). episode_length=4 forces a
    deterministic truncation reset for EVERY env mid-rollout, so this also
    pins that env_offset globalizes the in-kernel PRNG ids: the sharded run
    must reproduce the unsharded auto-reset stream exactly."""
    from jax.sharding import Mesh, PartitionSpec as P

    cfg = EnvConfig(
        init=InitConfig(max_angle=0.2, linear_velocity_std=0.02,
                        angular_velocity_std=0.02),
        termination=TerminationConfig(position_bound=50.0,
                                      angular_velocity_bound=1000.0),
        episode_length=4,  # truncation reset at step 4 of 8, every env
    )
    env = L2F(cfg)
    n = 2048  # 2 devices x 1024 rows
    params, es, obs0, student = _setup(env, n=n)
    run = make_fused_collect(student, 8, cfg, chunk=4)
    obs_ref, reset_ref = run(params, es.dynamics, 3)
    assert float(jnp.sum(reset_ref)) >= n  # resets DID occur

    per_shard = n // 2
    mesh = Mesh(np.array(jax.devices()[:2]), ("env",))
    sharded = jax.experimental.shard_map.shard_map(
        lambda p, s: run(p, s, 3, jax.lax.axis_index("env") * per_shard),
        mesh=mesh,
        in_specs=(P("env"), P("env")),
        out_specs=(P(None, "env"), P(None, "env")),
        check_rep=False,
    )
    obs_s, reset_s = sharded(params, es.dynamics)
    # reset/termination pattern must match BITWISE (pins that env_offset
    # reproduces the unsharded PRNG redraw stream exactly)
    np.testing.assert_array_equal(np.asarray(reset_s), np.asarray(reset_ref))
    # obs: the two runs compile DIFFERENT XLA programs (2048- vs 1024-wide
    # shards), whose fusion choices can differ by 1 ulp; the chaotic
    # dynamics amplify that to ~2e-6 within 4 post-reset steps (measured).
    # 1e-4 still fails loudly on any wrong PRNG draw (state deltas are O(1)).
    np.testing.assert_allclose(np.asarray(obs_s), np.asarray(obs_ref),
                               atol=1e-4)
