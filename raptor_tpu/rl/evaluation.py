"""Deterministic evaluation rollouts — the reference's 5-stat contract.

Mirrors `rl/utils/evaluation` (SURVEY §3.4): run the policy with its mean
action on M fresh envs for one full episode cap, report exactly the stats
emitted as tfevents tags `evaluation/{return,episode_length}/{mean,std}` and
`evaluation/share_terminated` (SURVEY §6.2).

Works with both feedforward actors (MLP SAC teachers) and the recurrent
foundation policy (pass `recurrent=True` with a policy-step fn).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from raptor_tpu.env.quad import L2F
from raptor_tpu.env.types import DynamicsParams


class EvalStats(NamedTuple):
    return_mean: jnp.ndarray
    return_std: jnp.ndarray
    episode_length_mean: jnp.ndarray
    episode_length_std: jnp.ndarray
    share_terminated: jnp.ndarray


def evaluate(
    env: L2F,
    params: DynamicsParams,  # [M] stacked eval airframes
    policy_step: Callable,  # (carry, obs[M,D]) -> (carry, action[M,4])
    policy_carry,
    key: jax.Array,
    n_envs: int,
    episode_length: int | None = None,
) -> EvalStats:
    """One evaluation pass: episodes run to termination or the cap; stats
    are over the M (first) episodes only — resets after the first episode do
    not contribute (matching per-episode eval semantics)."""
    t_max = episode_length or env.EPISODE_LENGTH
    v_reset, _ = env.vector_ops()
    v_dstep = jax.vmap(env.dynamics_step, in_axes=(0, 0, 0, 0))
    v_obs = jax.vmap(env.observe, in_axes=(0, 0, 0))
    v_rew = jax.vmap(env.reward, in_axes=(0, 0, 0, 0))
    v_term = jax.vmap(env.terminated, in_axes=(0, 0))

    es, obs = v_reset(jax.random.split(key, n_envs), params)

    def body(carry, _):
        state, prev_action, obs, pcarry, alive, ret, length, k = carry
        pcarry, action = policy_step(pcarry, obs)
        action = jnp.clip(action, -1.0, 1.0)
        k, k_step = jax.random.split(k)
        stepped, _ = v_dstep(params, state, action, jax.random.split(k_step, n_envs))
        # freeze dead envs: integrating a diverged state overflows f32 and
        # the resulting NaN poisons even masked (x*0) accumulators
        keep = alive
        next_state = jax.tree.map(
            lambda a, b: a * keep.reshape((n_envs,) + (1,) * (a.ndim - 1))
            + b * (1.0 - keep.reshape((n_envs,) + (1,) * (a.ndim - 1))),
            stepped,
            state,
        )
        reward = v_rew(params, state, action, next_state)
        terminated = v_term(params, next_state)
        ret = ret + reward * alive
        length = length + alive.astype(jnp.int32)
        alive = alive * (1.0 - terminated.astype(jnp.float32))
        obs = v_obs(params, next_state, action)
        return (next_state, action, obs, pcarry, alive, ret, length, k), None

    init = (
        es.dynamics,
        jnp.zeros((n_envs, 4), jnp.float32),
        obs,
        policy_carry,
        jnp.ones((n_envs,), jnp.float32),
        jnp.zeros((n_envs,), jnp.float32),
        jnp.zeros((n_envs,), jnp.int32),
        key,
    )
    (_, _, _, _, alive, ret, length, _), _ = jax.lax.scan(
        body, init, None, length=t_max
    )
    length_f = length.astype(jnp.float32)
    return EvalStats(
        return_mean=jnp.mean(ret),
        return_std=jnp.std(ret),
        episode_length_mean=jnp.mean(length_f),
        episode_length_std=jnp.std(length_f),
        share_terminated=jnp.mean(1.0 - alive),
    )


def mlp_policy_step(actor_params, actor_obs_dim: int | None = None):
    """Policy-step fn for a feedforward SAC actor (mean action)."""
    from raptor_tpu.rl import networks

    def step(carry, obs):
        o = obs if actor_obs_dim is None else obs[..., :actor_obs_dim]
        return carry, networks.actor_mean(actor_params, o)

    return step, ()


def gru_policy_step(policy_params, batch_size: int):
    """Policy-step fn for the recurrent foundation policy (obs[:, :22])."""
    from raptor_tpu.policy import network as policy_net

    def step(carry, obs):
        h = carry
        h, action = policy_net.apply_step(policy_params, h, obs[..., :22])
        return h, action

    return step, policy_net.initial_hidden(policy_params, batch_size)
