"""Soft Actor-Critic learner: twin Q critics, target networks, entropy
temperature auto-tuning, squashed-Gaussian actor.

TPU-native equivalent of the reference `rl/algorithms/sac` (SURVEY §3.4).
The whole update is one pure function over a `SACState` pytree — which makes
the reference's 1000-process teacher farm collapse into `vmap(sac_update)`
over a population axis (SURVEY §3.7 "the single biggest idiomatic win").
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from raptor_tpu.rl import networks


@dataclasses.dataclass(frozen=True)
class SACConfig:
    gamma: float = 0.99
    tau: float = 0.005  # polyak rate for target critics
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    alpha_lr: float = 3e-4
    init_alpha: float = 0.2
    target_entropy_per_dim: float = -1.0  # target_entropy = c * action_dim
    actor_hidden: Tuple[int, ...] = (64, 64)
    critic_hidden: Tuple[int, ...] = (64, 64)
    # --- TPU learner fast path (VERDICT r3 weak #1) ---
    # 'bfloat16' executes actor/critic matmuls (fwd + bwd) as bf16-operand /
    # f32-accumulate MXU ops; master weights, losses, targets and optimizer
    # state remain f32. None = exact f32.
    compute_dtype: str | None = None
    # execute the twin critics as one batched matmul per layer (numerically
    # identical; halves critic op count — the learner is small-op-bound)
    stack_critics: bool = False
    # optax.flatten: run the adam math on ONE raveled vector per optimizer
    # instead of per-leaf ops (identical math, far fewer tiny VPU passes)
    flat_optim: bool = False

    @property
    def _dtype(self):
        if self.compute_dtype is None:
            return None
        return jnp.dtype(self.compute_dtype).type


class SACState(struct.PyTreeNode):
    actor: dict
    critic: dict
    target_critic: dict
    log_alpha: jnp.ndarray
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    alpha_opt: optax.OptState
    step: jnp.ndarray


class SACMetrics(NamedTuple):
    critic_loss: jnp.ndarray
    actor_loss: jnp.ndarray
    alpha_loss: jnp.ndarray
    alpha: jnp.ndarray
    q1_mean: jnp.ndarray
    entropy: jnp.ndarray


def make_optimizers(config: SACConfig):
    opts = (
        optax.adam(config.actor_lr),
        optax.adam(config.critic_lr),
        optax.adam(config.alpha_lr),
    )
    if config.flat_optim:
        opts = tuple(optax.flatten(o) for o in opts)
    return opts


def sac_init(
    key: jax.Array, obs_dim: int, action_dim: int, config: SACConfig = SACConfig()
) -> SACState:
    ka, kc = jax.random.split(key)
    actor = networks.actor_init(ka, obs_dim, action_dim, config.actor_hidden)
    critic = networks.critic_init(kc, obs_dim, action_dim, config.critic_hidden)
    actor_opt, critic_opt, alpha_opt = make_optimizers(config)
    log_alpha = jnp.log(jnp.float32(config.init_alpha))
    return SACState(
        actor=actor,
        critic=critic,
        target_critic=jax.tree.map(jnp.copy, critic),
        log_alpha=log_alpha,
        actor_opt=actor_opt.init(actor),
        critic_opt=critic_opt.init(critic),
        alpha_opt=alpha_opt.init(log_alpha),
        step=jnp.int32(0),
    )


def sac_update(
    state: SACState,
    key: jax.Array,
    batch: Tuple[jnp.ndarray, ...],  # (obs, action, reward, next_obs, done)
    config: SACConfig = SACConfig(),
) -> Tuple[SACState, SACMetrics]:
    """One SAC gradient step on a minibatch. Pure; vmap-able over a
    population axis (per-member state + per-member batch)."""
    obs, action, reward, next_obs, done = batch
    action_dim = action.shape[-1]
    target_entropy = config.target_entropy_per_dim * action_dim
    actor_optim, critic_optim, alpha_optim = make_optimizers(config)
    dtype, stacked = config._dtype, config.stack_critics
    k_next, k_pi = jax.random.split(key)
    alpha = jnp.exp(state.log_alpha)

    # ---- critic update ----
    next_action, next_logp = networks.actor_sample(
        state.actor, k_next, next_obs, dtype=dtype
    )
    tq1, tq2 = networks.critic_apply(
        state.target_critic, next_obs, next_action, dtype=dtype, stacked=stacked
    )
    target_v = jnp.minimum(tq1, tq2) - alpha * next_logp
    target_q = jax.lax.stop_gradient(
        reward + config.gamma * (1.0 - done) * target_v
    )

    def critic_loss_fn(critic):
        q1, q2 = networks.critic_apply(
            critic, obs, action, dtype=dtype, stacked=stacked
        )
        return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2), q1

    (critic_loss, q1_val), critic_grads = jax.value_and_grad(
        critic_loss_fn, has_aux=True
    )(state.critic)
    critic_updates, critic_opt = critic_optim.update(
        critic_grads, state.critic_opt, state.critic
    )
    critic = optax.apply_updates(state.critic, critic_updates)

    # ---- actor update ----
    def actor_loss_fn(actor):
        pi, logp = networks.actor_sample(actor, k_pi, obs, dtype=dtype)
        q1, q2 = networks.critic_apply(
            critic, obs, pi, dtype=dtype, stacked=stacked
        )
        q = jnp.minimum(q1, q2)
        return jnp.mean(alpha * logp - q), logp

    (actor_loss, logp_val), actor_grads = jax.value_and_grad(
        actor_loss_fn, has_aux=True
    )(state.actor)
    actor_updates, actor_opt = actor_optim.update(
        actor_grads, state.actor_opt, state.actor
    )
    actor = optax.apply_updates(state.actor, actor_updates)

    # ---- temperature update ----
    def alpha_loss_fn(log_alpha):
        return -jnp.mean(
            jnp.exp(log_alpha) * jax.lax.stop_gradient(logp_val + target_entropy)
        )

    alpha_loss, alpha_grad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
    alpha_updates, alpha_opt = alpha_optim.update(
        alpha_grad, state.alpha_opt, state.log_alpha
    )
    log_alpha = optax.apply_updates(state.log_alpha, alpha_updates)

    # ---- polyak target ----
    target_critic = jax.tree.map(
        lambda t, c: (1.0 - config.tau) * t + config.tau * c,
        state.target_critic,
        critic,
    )

    new_state = SACState(
        actor=actor,
        critic=critic,
        target_critic=target_critic,
        log_alpha=log_alpha,
        actor_opt=actor_opt,
        critic_opt=critic_opt,
        alpha_opt=alpha_opt,
        step=state.step + 1,
    )
    metrics = SACMetrics(
        critic_loss=critic_loss,
        actor_loss=actor_loss,
        alpha_loss=alpha_loss,
        alpha=jnp.exp(log_alpha),
        q1_mean=jnp.mean(q1_val),
        entropy=-jnp.mean(logp_val),
    )
    return new_state, metrics
