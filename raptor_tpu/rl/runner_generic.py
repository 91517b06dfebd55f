"""Generic off-policy runner: one collect+train scaffold for any learner
(SAC / TD3 / future algorithms).

`AlgorithmSpec` is the small protocol a learner exposes; the runner owns
envs, replay, and the jitted super-step. `rl.runner` remains the
SAC-specialized path (kept for its tuned defaults and tests); this module
closes the loop for TD3 and future additions without duplicating runner
logic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from raptor_tpu.env.quad import L2F, EnvState
from raptor_tpu.env.types import DynamicsParams
from raptor_tpu.rl import replay, runner
from raptor_tpu.rl.runner import RunnerConfig


@dataclasses.dataclass(frozen=True)
class AlgorithmSpec:
    """The learner protocol.

    init(key, obs_dim, action_dim) -> learner_state
    explore(learner_state, key, obs) -> action          (collection policy)
    update(learner_state, key, batch) -> (state, metrics)
    """

    init: Callable
    explore: Callable
    update: Callable


def sac_spec(config=None) -> AlgorithmSpec:
    from raptor_tpu.rl import networks, sac

    cfg = config or sac.SACConfig()
    return AlgorithmSpec(
        init=lambda key, o, a: sac.sac_init(key, o, a, cfg),
        explore=lambda st, key, obs: networks.actor_sample(st.actor, key, obs)[0],
        update=lambda st, key, batch: sac.sac_update(st, key, batch, cfg),
    )


def td3_spec(config=None) -> AlgorithmSpec:
    from raptor_tpu.rl import td3

    cfg = config or td3.TD3Config()

    def explore(st, key, obs):
        a = td3.deterministic_actor_apply(st.actor, obs)
        noise = jax.random.normal(key, a.shape) * cfg.exploration_noise_std
        return jnp.clip(a + noise, -1.0, 1.0)

    return AlgorithmSpec(
        init=lambda key, o, a: td3.td3_init(key, o, a, cfg),
        explore=explore,
        update=lambda st, key, batch: td3.td3_update(st, key, batch, cfg),
    )


class GenericTrainerState(struct.PyTreeNode):
    learner: Any
    buffer: replay.TransitionBuffer
    env_state: EnvState
    obs: jnp.ndarray
    key: jax.Array
    total_env_steps: jnp.ndarray


def generic_trainer_init(
    key: jax.Array,
    env: L2F,
    params: DynamicsParams,
    run_cfg: RunnerConfig,
    spec: AlgorithmSpec,
) -> GenericTrainerState:
    k_l, k_reset, k_carry = jax.random.split(key, 3)
    obs_dim = env.OBSERVATION_DIM
    actor_obs = run_cfg.actor_obs_dim or obs_dim
    learner = spec.init(k_l, actor_obs, env.ACTION_DIM)
    v_reset, _ = env.vector_ops()
    env_state, obs = v_reset(jax.random.split(k_reset, run_cfg.n_envs), params)
    buffer = replay.transition_buffer_init(
        run_cfg.replay_capacity, run_cfg.n_envs, obs_dim, env.ACTION_DIM
    )
    return GenericTrainerState(
        learner=learner,
        buffer=buffer,
        env_state=env_state,
        obs=obs,
        key=k_carry,
        total_env_steps=jnp.int32(0),
    )


def make_generic_super_step(
    env: L2F, run_cfg: RunnerConfig, spec: AlgorithmSpec, random_actions: bool = False
):
    """One jitted (collect H + train G) program on the shared scaffolds
    (runner.collect_rollout / runner.train_steps — single source of truth
    for the transition/bootstrap semantics)."""

    def super_step(state: GenericTrainerState, params) -> Tuple[GenericTrainerState, Any]:
        explore = lambda k, o: spec.explore(state.learner, k, o)
        es, obs, key, (o, a, r, no, d) = runner.collect_rollout(
            env, params, run_cfg, explore,
            state.env_state, state.obs, state.key, random_actions,
        )
        buffer = replay.transition_buffer_add_rollout(state.buffer, o, a, r, no, d)
        learner, key, last = runner.train_steps(
            run_cfg, spec.update, buffer, state.learner, key
        )
        new_state = state.replace(
            learner=learner,
            buffer=buffer,
            env_state=es,
            obs=obs,
            key=key,
            total_env_steps=state.total_env_steps
            + run_cfg.rollout_length * run_cfg.n_envs,
        )
        return new_state, last

    return jax.jit(super_step, donate_argnums=(0,))
