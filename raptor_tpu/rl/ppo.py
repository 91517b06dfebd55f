"""PPO: clipped-surrogate on-policy training with GAE.

Capability mirror of the reference `rl/algorithms/ppo` (SURVEY §3.4). The
on-policy rollout + GAE + epochs-of-minibatches all run as one jitted
program: `ppo_rollout` scans H steps over N vmapped envs, `ppo_update`
scans epochs x minibatches — no host boundary inside an iteration.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from raptor_tpu.env.quad import L2F, EnvState
from raptor_tpu.env.types import DynamicsParams
from raptor_tpu.rl import networks


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    entropy_coef: float = 0.01
    value_coef: float = 0.5
    learning_rate: float = 3e-4
    max_grad_norm: float = 0.5
    n_epochs: int = 4
    n_minibatches: int = 4
    actor_hidden: Tuple[int, ...] = (64, 64)
    value_hidden: Tuple[int, ...] = (64, 64)
    rollout_length: int = 64


class PPOState(struct.PyTreeNode):
    actor: dict  # gaussian actor (mu, log_std heads) — tanh at exec time
    value: dict
    opt: optax.OptState
    step: jnp.ndarray


class PPOMetrics(NamedTuple):
    policy_loss: jnp.ndarray
    value_loss: jnp.ndarray
    entropy: jnp.ndarray
    approx_kl: jnp.ndarray


def _optim(config: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate),
    )


def ppo_init(
    key: jax.Array, obs_dim: int, action_dim: int, config: PPOConfig = PPOConfig()
) -> PPOState:
    ka, kv = jax.random.split(key)
    actor = networks.actor_init(ka, obs_dim, action_dim, config.actor_hidden)
    value = networks.mlp_init(kv, [obs_dim, *config.value_hidden, 1])
    params = {"actor": actor, "value": value}
    return PPOState(
        actor=actor, value=value, opt=_optim(config).init(params), step=jnp.int32(0)
    )


def _gaussian_logp(mu, log_std, action):
    std = jnp.exp(log_std)
    return jnp.sum(
        -0.5 * ((action - mu) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )


def ppo_rollout(
    state: PPOState,
    env: L2F,
    params: DynamicsParams,
    env_state: EnvState,
    obs: jnp.ndarray,
    key: jax.Array,
    config: PPOConfig,
):
    """Collect H on-policy steps; returns (env_state, obs, key, batch dict).
    Actions are pre-tanh Gaussian samples (log-prob in that space), executed
    tanh-squashed — consistent ratio computation under PPO."""
    _, v_step = env.vector_ops()

    def body(carry, _):
        es, obs, key = carry
        key, k_act = jax.random.split(key)
        mu, log_std = networks.actor_dist(state.actor, obs)
        raw = mu + jnp.exp(log_std) * jax.random.normal(k_act, mu.shape)
        logp = _gaussian_logp(mu, log_std, raw)
        value = networks.mlp_apply(state.value, obs)[..., 0]
        action = jnp.tanh(raw)
        es, next_obs, reward, done, info = v_step(params, es, action)
        # bootstrap value of the TRUE successor (pre-autoreset) state:
        # correct at episode boundaries, where next_obs is a fresh reset
        v_next = networks.mlp_apply(state.value, info["final_obs"])[..., 0]
        out = (
            obs, raw, logp, value, reward,
            done.astype(jnp.float32),
            info["terminated"].astype(jnp.float32),
            v_next,
        )
        return (es, next_obs, key), out

    (env_state, obs, key), (
        o, raw, logp, value, reward, done, terminated, v_next
    ) = jax.lax.scan(
        body, (env_state, obs, key), None, length=config.rollout_length
    )

    # GAE (reverse scan). Bootstrapping uses V(final_obs) and is cut only by
    # TRUE termination; time-limit truncation still bootstraps (partial-
    # episode bootstrapping — truncation is not a terminal state). The GAE
    # accumulator is cut at any episode boundary (done) so credit never
    # flows across episodes.
    def gae_body(gae, inp):
        value_t, reward_t, done_t, term_t, v_next_t = inp
        delta = reward_t + config.gamma * v_next_t * (1 - term_t) - value_t
        gae = delta + config.gamma * config.gae_lambda * (1 - done_t) * gae
        return gae, gae

    _, advantages = jax.lax.scan(
        gae_body,
        jnp.zeros_like(value[0]),
        (value, reward, done, terminated, v_next),
        reverse=True,
    )
    returns = advantages + value
    batch = {
        "obs": o,
        "raw_action": raw,
        "logp": logp,
        "advantage": advantages,
        "return": returns,
    }
    return env_state, obs, key, batch


def ppo_update(
    state: PPOState, key: jax.Array, batch: dict, config: PPOConfig = PPOConfig()
) -> Tuple[PPOState, PPOMetrics]:
    """Epochs x minibatches of clipped-surrogate updates on a flattened
    rollout batch."""
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), batch)
    n = flat["logp"].shape[0]
    mb_size = n // config.n_minibatches
    optim = _optim(config)

    adv = flat["advantage"]
    flat["advantage"] = (adv - adv.mean()) / (adv.std() + 1e-8)

    def loss_fn(params, mb):
        mu, log_std = networks.actor_dist(params["actor"], mb["obs"])
        logp = _gaussian_logp(mu, log_std, mb["raw_action"])
        ratio = jnp.exp(logp - mb["logp"])
        clipped = jnp.clip(ratio, 1 - config.clip_eps, 1 + config.clip_eps)
        policy_loss = -jnp.mean(
            jnp.minimum(ratio * mb["advantage"], clipped * mb["advantage"])
        )
        value = networks.mlp_apply(params["value"], mb["obs"])[..., 0]
        value_loss = jnp.mean((value - mb["return"]) ** 2)
        entropy = jnp.mean(jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), -1))
        total = (
            policy_loss
            + config.value_coef * value_loss
            - config.entropy_coef * entropy
        )
        approx_kl = jnp.mean(mb["logp"] - logp)
        return total, PPOMetrics(policy_loss, value_loss, entropy, approx_kl)

    def epoch_body(carry, key_e):
        params, opt = carry
        perm = jax.random.permutation(key_e, n)[: mb_size * config.n_minibatches]
        perm = perm.reshape(config.n_minibatches, mb_size)

        def mb_body(carry, idx):
            params, opt = carry
            mb = jax.tree.map(lambda x: x[idx], flat)
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb
            )
            updates, opt = optim.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt), metrics

        (params, opt), metrics = jax.lax.scan(mb_body, (params, opt), perm)
        return (params, opt), jax.tree.map(lambda m: m[-1], metrics)

    params = {"actor": state.actor, "value": state.value}
    (params, opt), metrics = jax.lax.scan(
        epoch_body,
        (params, state.opt),
        jax.random.split(key, config.n_epochs),
    )
    last = jax.tree.map(lambda m: m[-1], metrics)
    return (
        state.replace(
            actor=params["actor"], value=params["value"], opt=opt, step=state.step + 1
        ),
        last,
    )


def make_ppo_iteration(env: L2F, config: PPOConfig):
    """One jitted (rollout + update) PPO iteration."""

    def iteration(state, params, env_state, obs, key):
        env_state, obs, key, batch = ppo_rollout(
            state, env, params, env_state, obs, key, config
        )
        key, k_up = jax.random.split(key)
        state, metrics = ppo_update(state, k_up, batch, config)
        return state, env_state, obs, key, metrics

    return jax.jit(iteration, donate_argnums=(2,))
