"""TD3: twin-delayed deterministic policy gradient.

Capability mirror of the reference `rl/algorithms/td3` (SURVEY §3.4 — in
rl-tools but not on raptor's critical path). Same functional shape as
`rl.sac`: pure update over a pytree state, vmap-able over populations, and
drop-in compatible with the `TransitionBuffer` minibatch tuple.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from raptor_tpu.rl import networks


@dataclasses.dataclass(frozen=True)
class TD3Config:
    gamma: float = 0.99
    tau: float = 0.005
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    policy_delay: int = 2
    target_noise_std: float = 0.2
    target_noise_clip: float = 0.5
    exploration_noise_std: float = 0.1
    actor_hidden: Tuple[int, ...] = (64, 64)
    critic_hidden: Tuple[int, ...] = (64, 64)


class TD3State(struct.PyTreeNode):
    actor: dict
    target_actor: dict
    critic: dict
    target_critic: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    step: jnp.ndarray


class TD3Metrics(NamedTuple):
    critic_loss: jnp.ndarray
    actor_loss: jnp.ndarray
    q1_mean: jnp.ndarray


def deterministic_actor_init(key, obs_dim: int, action_dim: int, hidden: Sequence[int]):
    return networks.mlp_init(key, [obs_dim, *hidden, action_dim], final_scale=0.01)


def deterministic_actor_apply(params, obs):
    return jnp.tanh(networks.mlp_apply(params, obs))


def _optims(config: TD3Config):
    return optax.adam(config.actor_lr), optax.adam(config.critic_lr)


def td3_init(
    key: jax.Array, obs_dim: int, action_dim: int, config: TD3Config = TD3Config()
) -> TD3State:
    ka, kc = jax.random.split(key)
    actor = deterministic_actor_init(ka, obs_dim, action_dim, config.actor_hidden)
    critic = networks.critic_init(kc, obs_dim, action_dim, config.critic_hidden)
    a_opt, c_opt = _optims(config)
    return TD3State(
        actor=actor,
        target_actor=jax.tree.map(jnp.copy, actor),
        critic=critic,
        target_critic=jax.tree.map(jnp.copy, critic),
        actor_opt=a_opt.init(actor),
        critic_opt=c_opt.init(critic),
        step=jnp.int32(0),
    )


def td3_update(
    state: TD3State,
    key: jax.Array,
    batch: Tuple[jnp.ndarray, ...],
    config: TD3Config = TD3Config(),
) -> Tuple[TD3State, TD3Metrics]:
    obs, action, reward, next_obs, done = batch
    a_optim, c_optim = _optims(config)

    # ---- critic ----
    noise = jnp.clip(
        jax.random.normal(key, action.shape) * config.target_noise_std,
        -config.target_noise_clip,
        config.target_noise_clip,
    )
    next_action = jnp.clip(
        deterministic_actor_apply(state.target_actor, next_obs) + noise, -1.0, 1.0
    )
    tq1, tq2 = networks.critic_apply(state.target_critic, next_obs, next_action)
    target_q = jax.lax.stop_gradient(
        reward + config.gamma * (1.0 - done) * jnp.minimum(tq1, tq2)
    )

    def critic_loss_fn(critic):
        q1, q2 = networks.critic_apply(critic, obs, action)
        return jnp.mean((q1 - target_q) ** 2) + jnp.mean((q2 - target_q) ** 2), q1

    (critic_loss, q1_val), critic_grads = jax.value_and_grad(
        critic_loss_fn, has_aux=True
    )(state.critic)
    c_updates, critic_opt = c_optim.update(critic_grads, state.critic_opt, state.critic)
    critic = optax.apply_updates(state.critic, c_updates)

    # ---- delayed actor + target updates ----
    do_policy = (state.step % config.policy_delay) == 0

    def actor_loss_fn(actor):
        pi = deterministic_actor_apply(actor, obs)
        q1, _ = networks.critic_apply(critic, obs, pi)
        return -jnp.mean(q1)

    actor_loss, actor_grads = jax.value_and_grad(actor_loss_fn)(state.actor)
    a_updates, actor_opt_new = a_optim.update(
        actor_grads, state.actor_opt, state.actor
    )
    actor_new = optax.apply_updates(state.actor, a_updates)

    polyak = lambda t, c: jax.tree.map(
        lambda a, b: (1 - config.tau) * a + config.tau * b, t, c
    )
    select = lambda new, old: jax.tree.map(
        lambda n, o: jnp.where(do_policy, n, o), new, old
    )
    actor = select(actor_new, state.actor)
    actor_opt = select(actor_opt_new, state.actor_opt)
    target_actor = select(polyak(state.target_actor, actor), state.target_actor)
    target_critic = select(polyak(state.target_critic, critic), state.target_critic)

    new_state = TD3State(
        actor=actor,
        target_actor=target_actor,
        critic=critic,
        target_critic=target_critic,
        actor_opt=actor_opt,
        critic_opt=critic_opt,
        step=state.step + 1,
    )
    return new_state, TD3Metrics(
        critic_loss=critic_loss, actor_loss=actor_loss, q1_mean=jnp.mean(q1_val)
    )
