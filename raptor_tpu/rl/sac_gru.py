"""Recurrent SAC: GRU actor-critic trained by BPTT over replayed sequences.

Completes the foundation recipe's recurrent off-policy path (SURVEY §7
Stage 3: "BPTT SAC or SAC-teachers + DAgger" — both are provided; DAgger in
`distill.post_training`, BPTT SAC here). The actor uses the foundation
policy's exact backbone (Dense->GRU(16)->Dense head, §A.1/§A.2 semantics via
`policy.network`) with a squashed-Gaussian head; critics are twin recurrent
GRU networks over (obs, action).

Sequences come from `replay.SequenceBuffer`; reset masks re-inject learned
initial hidden states at episode boundaries, and target bootstrapping is
masked across boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from raptor_tpu.policy import network as gru_net


@dataclasses.dataclass(frozen=True)
class SACGRUConfig:
    gamma: float = 0.99
    tau: float = 0.005
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    alpha_lr: float = 3e-4
    init_alpha: float = 0.2
    target_entropy_per_dim: float = -1.0
    hidden_dim: int = 16  # GRU width (foundation policy: 16)
    log_std_min: float = -10.0
    log_std_max: float = 2.0
    # R2D2-style burn-in (VERDICT r1 weak #4): sampled windows re-inject the
    # learned h0 at t=0, which is biased mid-episode; the first `burn_in`
    # steps only warm up the hidden states and are masked out of every loss.
    burn_in: int = 0
    # Asymmetric actor-critic (round-4 BPTT-SAC diagnosis, VERDICT r3
    # weak #5): when set, the batch obs carries the FULL privileged
    # observation (policy dims + normalized-dynamics tail) — critics
    # consume all of it while the actor sees only obs[..., :actor_obs_dim],
    # mirroring the MLP-SAC teachers' structure (SURVEY §3.3 'policy obs =
    # first 22 dims of a larger privileged obs'). None = symmetric
    # (round-3 behavior: everything trains on the pre-sliced policy obs).
    actor_obs_dim: int | None = None
    # independent critic GRU width (None = hidden_dim); the deployable
    # actor stays at the foundation-policy width.
    critic_hidden_dim: int | None = None


class SACGRUState(struct.PyTreeNode):
    actor: dict
    critic1: dict
    critic2: dict
    target1: dict
    target2: dict
    log_alpha: jnp.ndarray
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    alpha_opt: optax.OptState
    step: jnp.ndarray


class SACGRUMetrics(NamedTuple):
    critic_loss: jnp.ndarray
    actor_loss: jnp.ndarray
    alpha: jnp.ndarray
    entropy: jnp.ndarray


def _scan_gru(params, seq, reset, h0_batch):
    """Run a gru_net over [T, B, in] with reset re-injection; returns
    [T, B, out]."""

    def step(h, inp):
        x_t, reset_t = inp
        h = jnp.where(reset_t[:, None], h0_batch, h)
        h, y = gru_net.apply_step(params, h, x_t)
        return h, y

    _, out = jax.lax.scan(step, h0_batch, (seq, reset))
    return out


def actor_forward(params, obs_seq, reset, config: SACGRUConfig):
    """[T, B, obs] -> (mu, log_std) [T, B, act]."""
    B = obs_seq.shape[1]
    h0 = gru_net.initial_hidden(params, B)
    out = _scan_gru(params, obs_seq, reset, h0)
    mu, log_std = jnp.split(out, 2, axis=-1)
    return mu, jnp.clip(log_std, config.log_std_min, config.log_std_max)


def critic_forward(params, obs_seq, action_seq, reset):
    x = jnp.concatenate([obs_seq, action_seq], axis=-1)
    B = x.shape[1]
    h0 = gru_net.initial_hidden(params, B)
    return _scan_gru(params, x, reset, h0)[..., 0]  # [T, B]


def _sample_squash(key, mu, log_std):
    """Shared squashed-Gaussian sampler (single source of the numerically
    delicate log-prob correction)."""
    from raptor_tpu.rl import networks

    return networks.sample_and_squash(key, mu, log_std)


def sac_gru_init(
    key: jax.Array,
    obs_dim: int,
    action_dim: int,
    config: SACGRUConfig = SACGRUConfig(),
) -> SACGRUState:
    ka, k1, k2 = jax.random.split(key, 3)
    h = config.hidden_dim
    hc = config.critic_hidden_dim or h
    actor_in = config.actor_obs_dim or obs_dim
    actor = gru_net.init_params(ka, actor_in, h, 2 * action_dim)
    critic1 = gru_net.init_params(k1, obs_dim + action_dim, hc, 1)
    critic2 = gru_net.init_params(k2, obs_dim + action_dim, hc, 1)
    a_opt, c_opt, al_opt = _optims(config)
    log_alpha = jnp.log(jnp.float32(config.init_alpha))
    return SACGRUState(
        actor=actor,
        critic1=critic1,
        critic2=critic2,
        target1=jax.tree.map(jnp.copy, critic1),
        target2=jax.tree.map(jnp.copy, critic2),
        log_alpha=log_alpha,
        actor_opt=a_opt.init(actor),
        critic_opt=c_opt.init((critic1, critic2)),
        alpha_opt=al_opt.init(log_alpha),
        step=jnp.int32(0),
    )


def graft_actor_from_student(actor: dict, student: dict, action_dim: int,
                             init_log_std: float = -2.0) -> dict:
    """Initialize a squashed-Gaussian GRU actor from a distilled student
    (RL fine-tuning, docs/MIGRATION.md §6 lever 4).

    dense_0/gru_1 copy exactly; the student's action head becomes the mu
    half of the 2*action_dim head (log-std half: zero weights, constant
    init_log_std bias). The student's deployed contract is
    clip(identity) while the SAC actor deploys tanh(mu), so the grafted
    policy's actions are tanh-compressed relative to the student's —
    exact for small actions, ~20% shrunk near |a|=0.9."""
    student = jax.tree.map(jnp.asarray, student)
    assert (student["gru_1"]["initial_hidden_state"].shape
            == actor["gru_1"]["initial_hidden_state"].shape), (
        "student hidden width must match the SAC actor's")
    w2, b2 = actor["dense_2"]["weights"], actor["dense_2"]["biases"]
    w2 = w2.at[:action_dim].set(student["dense_2"]["weights"])
    w2 = w2.at[action_dim:].set(0.0)
    b2 = b2.at[:action_dim].set(student["dense_2"]["biases"])
    b2 = b2.at[action_dim:].set(init_log_std)
    return {
        "dense_0": student["dense_0"],
        "gru_1": student["gru_1"],
        "dense_2": {"weights": w2, "biases": b2},
    }


def _optims(config: SACGRUConfig):
    return (
        optax.adam(config.actor_lr),
        optax.adam(config.critic_lr),
        optax.adam(config.alpha_lr),
    )


def sac_gru_update(
    state: SACGRUState,
    key: jax.Array,
    batch: dict,  # SequenceBuffer.sample output: [B, T, ...]
    config: SACGRUConfig = SACGRUConfig(),
) -> Tuple[SACGRUState, SACGRUMetrics]:
    """One BPTT gradient step on a batch of sequences.

    Transitions bootstrap t -> t+1 within the window; pairs crossing an
    episode boundary (reset[t+1] == 1) or containing a terminal state are
    masked out of the critic loss.
    """
    # to time-major [T, B, ...]
    obs = jnp.swapaxes(batch["obs"], 0, 1)
    action = jnp.swapaxes(batch["action"], 0, 1)
    reward = jnp.swapaxes(batch["reward"], 0, 1)
    done = jnp.swapaxes(batch["done"], 0, 1)
    reset = jnp.swapaxes(batch["reset"], 0, 1)
    T, B = reward.shape
    reset = reset.at[0].set(jnp.ones_like(reset[0]))  # windows start fresh

    action_dim = action.shape[-1]
    target_entropy = config.target_entropy_per_dim * action_dim
    alpha = jnp.exp(state.log_alpha)
    k_next, k_pi = jax.random.split(key)
    a_optim, c_optim, al_optim = _optims(config)

    # asymmetric actor-critic: actor sees the policy slice, critics the
    # full privileged obs (no-op when actor_obs_dim is None)
    a_obs = (
        obs if config.actor_obs_dim is None
        else obs[..., : config.actor_obs_dim]
    )

    # ---- targets: policy action at every step, target-critic values ----
    mu_n, log_std_n = actor_forward(state.actor, a_obs, reset, config)
    a_next, logp_next = _sample_squash(k_next, mu_n, log_std_n)
    tq1 = critic_forward(state.target1, obs, a_next, reset)
    tq2 = critic_forward(state.target2, obs, a_next, reset)
    v_next = jnp.minimum(tq1, tq2) - alpha * logp_next  # [T, B]
    # transition t -> t+1: target uses v_next at t+1. Terminal transitions
    # (done[t]=1) train with target = r (no bootstrap) and MUST stay in the
    # loss — that is where the termination penalty reaches the critic. Only
    # truncation boundaries (reset without done) are excluded, since their
    # successor row belongs to another episode.
    valid = jnp.maximum(1.0 - reset[1:], done[:-1])  # [T-1, B]
    # burn-in: steps t < burn_in only warm up hidden states — no loss.
    trained = (jnp.arange(T) >= config.burn_in).astype(jnp.float32)  # [T]
    valid = valid * trained[:-1, None]
    w_actor = jnp.broadcast_to(trained[:, None], (T, B))  # [T, B]
    n_actor = jnp.maximum(jnp.sum(w_actor), 1.0)
    target_q = jax.lax.stop_gradient(
        reward[:-1] + config.gamma * (1.0 - done[:-1]) * v_next[1:]
    )

    def critic_loss_fn(critics):
        c1, c2 = critics
        q1 = critic_forward(c1, obs, action, reset)[:-1]
        q2 = critic_forward(c2, obs, action, reset)[:-1]
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        l1 = jnp.sum(valid * (q1 - target_q) ** 2) / denom
        l2 = jnp.sum(valid * (q2 - target_q) ** 2) / denom
        return l1 + l2

    critic_loss, critic_grads = jax.value_and_grad(critic_loss_fn)(
        (state.critic1, state.critic2)
    )
    c_updates, critic_opt = c_optim.update(
        critic_grads, state.critic_opt, (state.critic1, state.critic2)
    )
    critic1, critic2 = optax.apply_updates(
        (state.critic1, state.critic2), c_updates
    )

    # ---- actor ----
    def actor_loss_fn(actor):
        mu, log_std = actor_forward(actor, a_obs, reset, config)
        pi, logp = _sample_squash(k_pi, mu, log_std)
        q1 = critic_forward(critic1, obs, pi, reset)
        q2 = critic_forward(critic2, obs, pi, reset)
        q = jnp.minimum(q1, q2)
        return jnp.sum(w_actor * (alpha * logp - q)) / n_actor, logp

    (actor_loss, logp_val), actor_grads = jax.value_and_grad(
        actor_loss_fn, has_aux=True
    )(state.actor)
    a_updates, actor_opt = a_optim.update(actor_grads, state.actor_opt, state.actor)
    actor = optax.apply_updates(state.actor, a_updates)

    # ---- alpha ----
    def alpha_loss_fn(log_alpha):
        return -jnp.sum(
            w_actor
            * jnp.exp(log_alpha)
            * jax.lax.stop_gradient(logp_val + target_entropy)
        ) / n_actor

    _, al_grad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
    al_updates, alpha_opt = al_optim.update(al_grad, state.alpha_opt, state.log_alpha)
    log_alpha = optax.apply_updates(state.log_alpha, al_updates)

    polyak = lambda t, c: jax.tree.map(
        lambda a, b: (1 - config.tau) * a + config.tau * b, t, c
    )
    new_state = state.replace(
        actor=actor,
        critic1=critic1,
        critic2=critic2,
        target1=polyak(state.target1, critic1),
        target2=polyak(state.target2, critic2),
        log_alpha=log_alpha,
        actor_opt=actor_opt,
        critic_opt=critic_opt,
        alpha_opt=alpha_opt,
        step=state.step + 1,
    )
    return new_state, SACGRUMetrics(
        critic_loss=critic_loss,
        actor_loss=actor_loss,
        alpha=jnp.exp(log_alpha),
        entropy=-jnp.sum(w_actor * logp_val) / n_actor,
    )


def recurrent_actor_step(actor_params, config: SACGRUConfig = SACGRUConfig()):
    """(hidden, obs[B, D]) -> (hidden, mean action) — for eval rollouts."""

    def step(h, obs):
        h, out = gru_net.apply_step(actor_params, h, obs)
        mu, _ = jnp.split(out, 2, axis=-1)
        return h, jnp.tanh(mu)

    return step
