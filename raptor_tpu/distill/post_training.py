"""Post-training: distill a teacher population into the recurrent foundation
policy (the reference's `foundation_policy_post_training`, SURVEY §4.4).

Round-based on-policy distillation (DAgger-style, ~160 rounds in the shipped
log, SURVEY §6.2):

  round:
    collect: roll the student (beta-mixed with teachers early on) across the
             whole airframe population; teachers relabel every visited state
             with their (privileged-obs) mean action          [one jitted scan]
    train:   supervised BPTT over the collected [T]-step sequences, MSE of
             student action vs teacher label, multiple epochs  [one jitted scan]
    eval:    aggregate 5-stat eval + held-out crazyflie dynamics
             (tfevents tags `evaluation/*`, `crazyflie/*`)
    checkpoint: reference-schema h5 export with golden example I/O

The whole collect phase is one XLA program over [K, M] envs — the student's
GRU hidden state resets (to its learned initial state) exactly where an env
auto-resets, and the same reset masks drive hidden re-injection during BPTT.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from raptor_tpu.env.quad import L2F
from raptor_tpu.env.types import DynamicsParams, POLICY_OBS_DIM
from raptor_tpu.policy import network as student_net
from raptor_tpu.rl import networks


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    envs_per_teacher: int = 8
    rollout_length: int = 500  # T (= reference episode length)
    teacher_mix_initial: float = 1.0  # beta: share of teacher actions executed
    teacher_mix_final: float = 0.0
    teacher_mix_decay_rounds: int = 10
    epochs_per_round: int = 2
    batch_size: int = 64  # sequences per gradient step
    truncated_bptt: int = 0  # 0 = full-sequence BPTT
    learning_rate: float = 1e-3


class RoundData(NamedTuple):
    """One collected round: [T, K*M, ...] sequences."""

    obs: jnp.ndarray  # [T, B, 22] policy observations
    teacher_action: jnp.ndarray  # [T, B, 4]
    reset: jnp.ndarray  # [T, B] 1.0 where the env was freshly reset


def teacher_mix(cfg: DistillConfig, round_idx: int) -> float:
    if cfg.teacher_mix_decay_rounds <= 0:
        return cfg.teacher_mix_final
    frac = min(1.0, round_idx / cfg.teacher_mix_decay_rounds)
    return cfg.teacher_mix_initial + frac * (
        cfg.teacher_mix_final - cfg.teacher_mix_initial
    )


def make_collect(env: L2F, cfg: DistillConfig):
    """Jitted round-collection: (student_params, teacher_actors [K],
    env_params [K, M], key, beta) -> RoundData."""
    _, v_step = env.vector_ops()
    v_reset = jax.vmap(env.reset, in_axes=(0, 0))

    def collect(student_params, teacher_actors, env_params, key, beta):
        k_reset, k_scan = jax.random.split(key)
        k_shape = jax.tree.leaves(env_params)[0].shape  # (K, M, ...)
        K, M = k_shape[0], k_shape[1]
        flat_params = jax.tree.map(
            lambda x: x.reshape((K * M,) + x.shape[2:]), env_params
        )
        es, obs = v_reset(jax.random.split(k_reset, K * M), flat_params)
        h0 = student_net.initial_hidden(student_params, K * M)

        def teacher_label(obs_full):
            # obs_full [K*M, D] -> per-teacher mean action via vmap over K
            obs_k = obs_full.reshape(K, M, -1)
            act_k = jax.vmap(networks.actor_mean)(teacher_actors, obs_k)
            return act_k.reshape(K * M, -1)

        def body(carry, key_t):
            es, obs, h = carry
            h_new, student_action = student_net.apply_step(
                student_params, h, obs[..., :POLICY_OBS_DIM]
            )
            label = teacher_label(obs)
            use_teacher = (
                jax.random.uniform(key_t, (K * M, 1)) < beta
            ).astype(jnp.float32)
            action = use_teacher * label + (1.0 - use_teacher) * jnp.clip(
                student_action, -1.0, 1.0
            )
            es2, next_obs, reward, done, info = v_step(flat_params, es, action)
            # where the env auto-reset, restart the student hidden state
            reset = done.astype(jnp.float32)
            h_next = jnp.where(reset[:, None], h0, h_new)
            out = (obs[..., :POLICY_OBS_DIM], label, reset)
            return (es2, next_obs, h_next), out

        (_, _, _), (obs_seq, label_seq, reset_seq) = jax.lax.scan(
            body,
            (es, obs, h0),
            jax.random.split(k_scan, cfg.rollout_length),
        )
        return RoundData(obs=obs_seq, teacher_action=label_seq, reset=reset_seq)

    return jax.jit(collect)


def bptt_loss(student_params, obs, teacher_action, reset):
    """MSE over a [T, B] batch of sequences with reset-masked hidden carry.

    reset[t] = 1 means the state at time t began a fresh episode, so the
    hidden state entering step t is the learned initial state.
    """
    B = obs.shape[1]
    h0 = student_net.initial_hidden(student_params, B)

    def step(h, inp):
        obs_t, reset_t = inp
        h = jnp.where(reset_t[:, None], h0, h)
        h, action = student_net.apply_step(student_params, h, obs_t)
        return h, action

    # shift: reset[t] marks the NEXT row's episode start (done at t resets
    # t+1); the first row of a collected round always starts fresh
    entering_reset = jnp.concatenate([jnp.ones((1, B)), reset[:-1]], axis=0)
    _, actions = jax.lax.scan(step, h0, (obs, entering_reset))
    return jnp.mean((actions - teacher_action) ** 2)


def make_train_epoch(cfg: DistillConfig):
    """Jitted one-epoch trainer: shuffles sequences, scans minibatch Adam
    steps with full-sequence BPTT."""
    optim = optax.adam(cfg.learning_rate)

    def train_epoch(student_params, opt_state, data: RoundData, key):
        T, B = data.obs.shape[0], data.obs.shape[1]
        bs = min(cfg.batch_size, B)
        n_batches = B // bs
        perm = jax.random.permutation(key, B)[: n_batches * bs]
        perm = perm.reshape(n_batches, bs)

        def step(carry, idx):
            params, opt = carry
            obs = data.obs[:, idx]
            lab = data.teacher_action[:, idx]
            rst = data.reset[:, idx]
            loss, grads = jax.value_and_grad(bptt_loss)(params, obs, lab, rst)
            updates, opt = optim.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt), loss

        (student_params, opt_state), losses = jax.lax.scan(
            step, (student_params, opt_state), perm
        )
        return student_params, opt_state, losses

    return jax.jit(train_epoch), optim


def distill(
    key: jax.Array,
    env: L2F,
    teacher_actors,  # stacked [K] actor params (privileged obs)
    airframes: DynamicsParams,  # [K]
    cfg: DistillConfig = DistillConfig(),
    n_rounds: int = 10,
    log_fn=None,
    round_hook=None,
) -> Tuple[dict, list]:
    """Run the full distillation. Returns (student_params, loss_history)."""
    from raptor_tpu.distill.population import broadcast_airframe_to_envs

    k_init, key = jax.random.split(key)
    student = student_net.init_params(k_init)
    collect = make_collect(env, cfg)
    train_epoch, optim = make_train_epoch(cfg)
    opt_state = optim.init(student)
    env_params = broadcast_airframe_to_envs(airframes, cfg.envs_per_teacher)

    loss_history = []
    grad_step = 0
    env_steps = 0
    for r in range(n_rounds):
        key, k_collect, k_epoch = jax.random.split(key, 3)
        beta = teacher_mix(cfg, r)
        data = collect(student, teacher_actors, env_params, k_collect, beta)
        env_steps += cfg.rollout_length * data.obs.shape[1]
        for e in range(cfg.epochs_per_round):
            student, opt_state, losses = train_epoch(
                student, opt_state, data, jax.random.fold_in(k_epoch, e)
            )
            for loss in losses:
                if log_fn is not None:
                    log_fn("loss", float(loss), grad_step)
                grad_step += 1
            loss_history.append(float(losses[-1]))
        if round_hook is not None:
            round_hook(r, student, env_steps)
    return student, loss_history
