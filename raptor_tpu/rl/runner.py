"""Off-policy runner: jitted collect+train super-steps.

TPU-native equivalent of the reference `rl/components/off_policy_runner` +
`rl/loop/steps/core` (SURVEY §3.4, §4.3): instead of a per-step host loop,
one jitted super-step runs `lax.scan` over H env steps (vmapped over N
envs), bulk-writes the rollout into the HBM replay ring, then runs G SAC
gradient steps — a single XLA program per training iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from raptor_tpu.env.quad import L2F, EnvState
from raptor_tpu.env.types import DynamicsParams
from raptor_tpu.rl import networks, replay, sac


@dataclasses.dataclass(frozen=True)
class RunnerConfig:
    n_envs: int = 64
    rollout_length: int = 32  # H env steps per super-step
    gradient_steps: int = 32  # G SAC updates per super-step
    batch_size: int = 256
    replay_capacity: int = 4096  # time rows (x n_envs transitions)
    actor_obs_dim: int | None = None  # policy sees obs[:, :this]; None = full
    # Row-contiguous replay sampling (batch = random whole time rows):
    # ~whole-train-phase speedup on TPU vs the (t, e) gather — see
    # replay.transition_buffer_sample_rows for the measured rationale.
    sample_rows: bool = False


class TrainerState(struct.PyTreeNode):
    sac: sac.SACState
    buffer: replay.TransitionBuffer
    env_state: EnvState  # vmapped [N]
    obs: jnp.ndarray  # [N, obs_dim]
    key: jax.Array
    total_env_steps: jnp.ndarray


def trainer_init(
    key: jax.Array,
    env: L2F,
    params: DynamicsParams,  # vmapped [N]
    run_cfg: RunnerConfig,
    sac_cfg: sac.SACConfig = sac.SACConfig(),
) -> TrainerState:
    n = run_cfg.n_envs
    k_sac, k_reset, k_carry = jax.random.split(key, 3)
    obs_dim = env.OBSERVATION_DIM
    actor_obs = run_cfg.actor_obs_dim or obs_dim
    sac_state = sac.sac_init(k_sac, actor_obs, env.ACTION_DIM, sac_cfg)
    v_reset, _ = env.vector_ops()
    env_state, obs = v_reset(jax.random.split(k_reset, n), params)
    buffer = replay.transition_buffer_init(
        run_cfg.replay_capacity, n, obs_dim, env.ACTION_DIM
    )
    return TrainerState(
        sac=sac_state,
        buffer=buffer,
        env_state=env_state,
        obs=obs,
        key=k_carry,
        total_env_steps=jnp.int32(0),
    )


def _actor_slice(obs: jnp.ndarray, run_cfg: RunnerConfig) -> jnp.ndarray:
    if run_cfg.actor_obs_dim is None:
        return obs
    return obs[..., : run_cfg.actor_obs_dim]


def collect_rollout(env, params, run_cfg, explore, es, obs, key,
                    random_actions=False):
    """Shared H-step rollout scaffold (used by this runner AND
    runner_generic): scan N envs, bulk transitions out.

    Uses info['final_obs'] for the bootstrap target and counts only true
    terminations (not truncations) as `done` — standard partial-episode
    bootstrapping.

    explore: (key, obs_sliced) -> action.
    Returns (es, obs, key, (o, a, r, next_o, d))."""
    _, v_step = env.vector_ops()

    def body(carry, _):
        es, obs, key = carry
        key, k_act = jax.random.split(key)
        if random_actions:
            action = jax.random.uniform(
                k_act, (run_cfg.n_envs, env.ACTION_DIM), minval=-1.0, maxval=1.0
            )
        else:
            action = explore(k_act, _actor_slice(obs, run_cfg))
        es, next_obs, reward, done, info = v_step(params, es, action)
        transition = (
            obs,
            action,
            reward,
            info["final_obs"],
            info["terminated"].astype(jnp.float32),
        )
        return (es, next_obs, key), transition

    (es, obs, key), out = jax.lax.scan(
        body, (es, obs, key), None, length=run_cfg.rollout_length
    )
    return es, obs, key, out


def train_steps(run_cfg, update, buffer, learner, key):
    """Shared G-gradient-step scaffold: sample minibatches from replay,
    apply `update: (learner, key, batch) -> (learner, metrics)`.
    Returns (learner, key, last_metrics)."""

    sample = (
        replay.transition_buffer_sample_rows
        if run_cfg.sample_rows
        else replay.transition_buffer_sample
    )

    def body(carry, _):
        learner, key = carry
        key, k_sample, k_update = jax.random.split(key, 3)
        obs, action, reward, next_obs, done = sample(
            buffer, k_sample, run_cfg.batch_size
        )
        batch = (
            _actor_slice(obs, run_cfg),
            action,
            reward,
            _actor_slice(next_obs, run_cfg),
            done,
        )
        learner, metrics = update(learner, k_update, batch)
        return (learner, key), metrics

    (learner, key), metrics = jax.lax.scan(
        body, (learner, key), None, length=run_cfg.gradient_steps
    )
    return learner, key, jax.tree.map(lambda m: m[-1], metrics)


def collect(
    state: TrainerState,
    env: L2F,
    params: DynamicsParams,
    run_cfg: RunnerConfig,
    random_actions: bool = False,
) -> TrainerState:
    """Roll H steps of N envs with the current SAC actor; bulk-write to
    replay (see collect_rollout for the transition semantics)."""
    explore = lambda k, o: networks.actor_sample(state.sac.actor, k, o)[0]
    es, obs, key, (o, a, r, no, d) = collect_rollout(
        env, params, run_cfg, explore, state.env_state, state.obs, state.key,
        random_actions,
    )
    buffer = replay.transition_buffer_add_rollout(state.buffer, o, a, r, no, d)
    return state.replace(
        buffer=buffer,
        env_state=es,
        obs=obs,
        key=key,
        total_env_steps=state.total_env_steps
        + run_cfg.rollout_length * run_cfg.n_envs,
    )


def collect_scripted(
    state: TrainerState,
    env: L2F,
    params: DynamicsParams,
    run_cfg: RunnerConfig,
    adaptive: bool = False,
) -> TrainerState:
    """DDPGfD-style demonstration collection (docs/MIGRATION.md §6 lever
    1b): roll H steps under the scripted recovery demonstrator
    (env.recovery) instead of the SAC actor and write the transitions into
    the replay ring, so teacher critics learn the fast flip's value — the
    maneuver SAC exploration never finds (RESULTS §round-4 failure-mode
    diagnosis). The reference has no analog: its teachers never see
    demonstrations (SURVEY §4.3). Combine with an init-severity curriculum
    (InitConfig.angle_power) so the demonstrations start from the severe
    attitudes whose values need learning."""
    import functools as _ft

    from raptor_tpu.env.recovery import recovery_action

    v_demo = jax.vmap(
        _ft.partial(recovery_action, adaptive=adaptive), in_axes=(0, 0)
    )
    _, v_step = env.vector_ops()

    def body(carry, _):
        es, obs = carry
        action = v_demo(params, es.dynamics)
        es, next_obs, reward, done, info = v_step(params, es, action)
        transition = (
            obs,
            action,
            reward,
            info["final_obs"],
            info["terminated"].astype(jnp.float32),
        )
        return (es, next_obs), transition

    (es, obs), (o, a, r, no, d) = jax.lax.scan(
        body, (state.env_state, state.obs), None,
        length=run_cfg.rollout_length,
    )
    buffer = replay.transition_buffer_add_rollout(state.buffer, o, a, r, no, d)
    return state.replace(
        buffer=buffer,
        env_state=es,
        obs=obs,
        total_env_steps=state.total_env_steps
        + run_cfg.rollout_length * run_cfg.n_envs,
    )


def train(
    state: TrainerState,
    run_cfg: RunnerConfig,
    sac_cfg: sac.SACConfig,
) -> Tuple[TrainerState, sac.SACMetrics]:
    """G SAC gradient steps on minibatches from replay."""
    update = lambda st, k, b: sac.sac_update(st, k, b, sac_cfg)
    sac_state, key, last = train_steps(
        run_cfg, update, state.buffer, state.sac, state.key
    )
    return state.replace(sac=sac_state, key=key), last


def make_super_step(env: L2F, run_cfg: RunnerConfig, sac_cfg: sac.SACConfig):
    """One jitted (collect H + train G) program; donate the trainer state so
    replay updates are in-place in HBM."""

    def super_step(state: TrainerState, params: DynamicsParams):
        state = collect(state, env, params, run_cfg)
        state, metrics = train(state, run_cfg, sac_cfg)
        return state, metrics

    return jax.jit(super_step, donate_argnums=(0,))


def make_warmup_step(env: L2F, run_cfg: RunnerConfig):
    def warmup(state: TrainerState, params: DynamicsParams):
        return collect(state, env, params, run_cfg, random_actions=True)

    return jax.jit(warmup, donate_argnums=(0,))
