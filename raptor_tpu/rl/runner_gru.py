"""Recurrent off-policy runner: sequence collection + BPTT SAC super-steps.

The recurrent sibling of `rl.runner`: the rollout scan carries the actor's
GRU hidden state (reset-injected exactly where envs auto-reset), writes
time-rows into the `SequenceBuffer`, and the train phase samples [B, T]
windows for `sac_gru_update`. One jitted program per super-step.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from raptor_tpu.env.quad import L2F, EnvState
from raptor_tpu.env.types import DynamicsParams
from raptor_tpu.policy import network as gru_net
from raptor_tpu.rl import replay, sac_gru


@dataclasses.dataclass(frozen=True)
class GRURunnerConfig:
    n_envs: int = 64
    rollout_length: int = 64
    gradient_steps: int = 8
    batch_size: int = 32  # sequences per update
    sample_seq_len: int = 32  # BPTT window
    replay_capacity: int = 4096  # time rows
    actor_obs_dim: int = 22  # the policy observation slice


class GRUTrainerState(struct.PyTreeNode):
    learner: sac_gru.SACGRUState
    buffer: replay.SequenceBuffer
    env_state: EnvState
    obs: jnp.ndarray
    hidden: jnp.ndarray  # [N, H] actor hidden carried across super-steps
    just_reset: jnp.ndarray  # [N] 1.0 where env was reset before next step
    key: jax.Array
    total_env_steps: jnp.ndarray


def gru_trainer_init(
    key: jax.Array,
    env: L2F,
    params: DynamicsParams,
    run_cfg: GRURunnerConfig,
    cfg: sac_gru.SACGRUConfig = sac_gru.SACGRUConfig(),
) -> GRUTrainerState:
    k_l, k_reset, k_carry = jax.random.split(key, 3)
    if cfg.actor_obs_dim is not None:
        # privileged critics: learner obs = full env obs; actor slice is
        # applied inside sac_gru_update. The two configs must agree.
        assert cfg.actor_obs_dim == run_cfg.actor_obs_dim, (
            cfg.actor_obs_dim, run_cfg.actor_obs_dim)
        learner_obs_dim = env.OBSERVATION_DIM
    else:
        learner_obs_dim = run_cfg.actor_obs_dim
    learner = sac_gru.sac_gru_init(k_l, learner_obs_dim, env.ACTION_DIM, cfg)
    v_reset, _ = env.vector_ops()
    env_state, obs = v_reset(jax.random.split(k_reset, run_cfg.n_envs), params)
    buffer = replay.sequence_buffer_init(
        run_cfg.replay_capacity, run_cfg.n_envs, env.OBSERVATION_DIM, env.ACTION_DIM
    )
    return GRUTrainerState(
        learner=learner,
        buffer=buffer,
        env_state=env_state,
        obs=obs,
        hidden=gru_net.initial_hidden(learner.actor, run_cfg.n_envs),
        just_reset=jnp.ones((run_cfg.n_envs,), jnp.float32),
        key=k_carry,
        total_env_steps=jnp.int32(0),
    )


def collect_sequences(
    state: GRUTrainerState,
    env: L2F,
    params: DynamicsParams,
    run_cfg: GRURunnerConfig,
    cfg: sac_gru.SACGRUConfig,
    random_actions: bool = False,
) -> GRUTrainerState:
    _, v_step = env.vector_ops()
    h0 = gru_net.initial_hidden(state.learner.actor, run_cfg.n_envs)

    def body(carry, _):
        es, obs, h, just_reset, key = carry
        key, k_act, k_exec = jax.random.split(key, 3)
        h = jnp.where(just_reset[:, None], h0, h)
        h_new, out = gru_net.apply_step(
            state.learner.actor, h, obs[..., : run_cfg.actor_obs_dim]
        )
        mu, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, cfg.log_std_min, cfg.log_std_max)
        if random_actions:
            action = jax.random.uniform(
                k_act, mu.shape, minval=-1.0, maxval=1.0
            )
        else:
            action, _ = sac_gru._sample_squash(k_act, mu, log_std)
        es2, next_obs, reward, done, info = v_step(params, es, action)
        row = (
            obs,
            action,
            reward,
            info["terminated"].astype(jnp.float32),
            just_reset,
        )
        return (es2, next_obs, h_new, done.astype(jnp.float32), key), row

    (es, obs, h, just_reset, key), (o, a, r, d, rs) = jax.lax.scan(
        body,
        (state.env_state, state.obs, state.hidden, state.just_reset, state.key),
        None,
        length=run_cfg.rollout_length,
    )
    buffer = replay.sequence_buffer_add_rollout(state.buffer, o, a, r, d, rs)
    return state.replace(
        buffer=buffer,
        env_state=es,
        obs=obs,
        hidden=h,
        just_reset=just_reset,
        key=key,
        total_env_steps=state.total_env_steps
        + run_cfg.rollout_length * run_cfg.n_envs,
    )


def train_sequences(
    state: GRUTrainerState,
    run_cfg: GRURunnerConfig,
    cfg: sac_gru.SACGRUConfig,
) -> Tuple[GRUTrainerState, sac_gru.SACGRUMetrics]:
    def body(carry, _):
        learner, key = carry
        key, k_s, k_u = jax.random.split(key, 3)
        batch = replay.sequence_buffer_sample(
            state.buffer, k_s, run_cfg.batch_size, run_cfg.sample_seq_len
        )
        if cfg.actor_obs_dim is None:
            # symmetric (round-3) mode: everything trains on the policy
            # slice; privileged mode keeps full obs for the critics.
            batch = dict(
                batch, obs=batch["obs"][..., : run_cfg.actor_obs_dim]
            )
        learner, metrics = sac_gru.sac_gru_update(learner, k_u, batch, cfg)
        return (learner, key), metrics

    (learner, key), metrics = jax.lax.scan(
        body, (state.learner, state.key), None, length=run_cfg.gradient_steps
    )
    last = jax.tree.map(lambda m: m[-1], metrics)
    return state.replace(learner=learner, key=key), last


def make_gru_super_step(env: L2F, run_cfg: GRURunnerConfig, cfg: sac_gru.SACGRUConfig):
    def super_step(state: GRUTrainerState, params: DynamicsParams):
        state = collect_sequences(state, env, params, run_cfg, cfg)
        state, metrics = train_sequences(state, run_cfg, cfg)
        return state, metrics

    return jax.jit(super_step, donate_argnums=(0,))


def make_gru_multi_step(
    env: L2F,
    run_cfg: GRURunnerConfig,
    cfg: sac_gru.SACGRUConfig,
    n_inner: int,
):
    """n_inner super-steps per jitted dispatch (amortizes per-call latency,
    see distill.population.make_population_multi_step)."""

    def super_step(state, params):
        state = collect_sequences(state, env, params, run_cfg, cfg)
        return train_sequences(state, run_cfg, cfg)

    def multi(state: GRUTrainerState, params: DynamicsParams):
        def body(state, _):
            state, _ = super_step(state, params)
            return state, None

        state, _ = jax.lax.scan(body, state, None, length=n_inner - 1)
        return super_step(state, params)

    return jax.jit(multi, donate_argnums=(0,))
