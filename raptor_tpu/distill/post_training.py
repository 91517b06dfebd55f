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
import functools
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
    # --- DAgger dataset aggregation (reference behavior: ~146k gradient
    # steps over 160 rounds => ~913 steps/round, consistent with re-fitting
    # an AGGREGATED dataset each round, not just the latest rollouts;
    # BASELINE.md "round structure" + tfevents loss-counter analysis).
    aggregate_capacity: int = 0  # sequences kept (0 = legacy: latest round only)
    grad_steps_per_round: int = 0  # minibatch updates per round from aggregate
    total_grad_steps: int = 0  # >0 enables warmup-cosine LR over this horizon
    lr_warmup_frac: float = 0.02
    lr_final_scale: float = 0.05  # cosine floor = lr * this
    # --- fused collect (ops/pallas_collect.py): whole-rollout Pallas kernel
    # for beta==0 rounds; teacher labels via one batched MXU relabel pass
    fused_collect: bool = False


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


def make_relabel(env: L2F):
    """Jitted post-hoc teacher labeling of recorded observation sequences.

    (teacher_actors [K], airframes [K], obs [T, K*M, 22]) -> labels
    [T, K*M, 4].  The privileged observation tail is a static per-airframe
    function (env.quad.privileged_tail), so labels for an entire collected
    round reduce to one batched MLP pass — [K] x ([T*M, 31] @ [31, 64] ...)
    MXU matmuls instead of per-timestep teacher dispatch inside the rollout
    (the TPU-native half of VERDICT r1 item 4; the other half is
    ops/pallas_collect.py)."""

    def relabel(teacher_actors, airframes, obs):
        T, KM = obs.shape[0], obs.shape[1]
        K = jax.tree.leaves(teacher_actors)[0].shape[0]
        M = KM // K
        tail = jax.vmap(env.privileged_tail)(airframes)  # [K*M, 9]
        full = jnp.concatenate(
            [obs, jnp.broadcast_to(tail[None], (T, KM, tail.shape[-1]))],
            axis=-1,
        )
        D = full.shape[-1]
        obs_k = (
            full.reshape(T, K, M, D).transpose(1, 0, 2, 3).reshape(K, T * M, D)
        )
        lab = jax.vmap(networks.actor_mean)(teacher_actors, obs_k)
        return (
            lab.reshape(K, T, M, 4).transpose(1, 0, 2, 3).reshape(T, KM, 4)
        )

    return jax.jit(relabel)


@functools.lru_cache(maxsize=4)
def _v_sample_state(env: L2F):
    """Per-env cached jitted vmapped initial-state sampler (a fresh jit per
    round would re-trace/lower every fused round)."""
    return jax.jit(jax.vmap(env.sample_state, in_axes=(0, 0)))


def fused_collect_round(
    student_params, teacher_actors, env_params, key, env: L2F,
    cfg: DistillConfig, relabel_fn, seed=None,
) -> RoundData:
    """One beta==0 collect round through the fused Pallas kernel + the
    batched relabel pass.  Initial states come from the same XLA sampler as
    the XLA path (so the t=0 distribution matches exactly); mid-rollout
    auto-resets use the in-kernel PRNG, seeded from this round's key (so
    different master seeds give different reset streams)."""
    from raptor_tpu.ops.pallas_collect import make_fused_collect

    k_shape = jax.tree.leaves(env_params)[0].shape
    K, M = k_shape[0], k_shape[1]
    flat_params = jax.tree.map(
        lambda x: x.reshape((K * M,) + x.shape[2:]), env_params
    )
    # the kernel integrates deterministic RK4: the per-step stochastic
    # disturbance forces/torques of quad.dynamics_step are NOT modeled.
    # Default randomization samples those stds at 0.0; reject anything else
    # rather than silently collecting on mismatched dynamics.
    dist = jnp.maximum(
        jnp.max(flat_params.disturbance_force_std),
        jnp.max(flat_params.disturbance_torque_std),
    )
    if float(dist) > 0.0:
        raise ValueError(
            "fused_collect is deterministic-dynamics only: airframes with "
            "nonzero disturbance_{force,torque}_std must use the XLA "
            "collect path (make_collect)"
        )
    k_init, k_kernel = jax.random.split(key)
    state0 = _v_sample_state(env)(
        jax.random.split(k_init, K * M), flat_params
    )
    if seed is None:
        seed = jax.random.randint(
            k_kernel, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
    run = make_fused_collect(student_params, cfg.rollout_length, env.config)
    obs, reset = run(flat_params, state0, seed)
    labels = relabel_fn(teacher_actors, flat_params, obs)
    return RoundData(obs=obs, teacher_action=labels, reset=reset)


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


class Aggregate(NamedTuple):
    """Device-resident DAgger dataset: a reservoir of [T]-step sequences.

    Stored bf16 (obs/labels are O(1) magnitudes; bf16 is lossless for the
    0/1 reset mask) to halve HBM footprint — capacity 40k seqs * 500 steps
    * 27 features ~= 1.1 GB. Columns [0:size) are valid; once full, new
    rounds overwrite uniformly-random columns (reservoir-style, so the
    training distribution stays close to uniform-over-history)."""

    obs: jnp.ndarray  # [T, C, 22] bf16
    teacher_action: jnp.ndarray  # [T, C, 4] bf16
    reset: jnp.ndarray  # [T, C] bf16 (0/1)
    size: jnp.ndarray  # [] int32, filled columns


def aggregate_init(cfg: DistillConfig, obs_dim: int = POLICY_OBS_DIM) -> Aggregate:
    T, C = cfg.rollout_length, cfg.aggregate_capacity
    return Aggregate(
        obs=jnp.zeros((T, C, obs_dim), jnp.bfloat16),
        teacher_action=jnp.zeros((T, C, 4), jnp.bfloat16),
        reset=jnp.zeros((T, C), jnp.bfloat16),
        size=jnp.zeros((), jnp.int32),
    )


def make_aggregate_add(cfg: DistillConfig):
    """Jitted (agg, RoundData, key) -> agg with the round's B sequences
    appended (or reservoir-replacing random columns once full)."""
    C = cfg.aggregate_capacity

    def add(agg: Aggregate, data: RoundData, key: jax.Array) -> Aggregate:
        B = data.obs.shape[1]
        assert B <= C, f"round batch {B} exceeds aggregate capacity {C}"
        seq = agg.size + jnp.arange(B, dtype=jnp.int32)
        # replacement columns must be DISTINCT (duplicate scatter indices
        # keep an arbitrary one, silently dropping new sequences) — use a
        # permutation prefix, not randint-with-replacement. On the single
        # size->C crossing round a replacement can still land on a column
        # just written by the seq path (harmless: one fresh sequence
        # overwrites another fresh one, once).
        rand = jax.random.permutation(key, C)[:B].astype(jnp.int32)
        idx = jnp.where(seq < C, seq, rand)
        return Aggregate(
            obs=agg.obs.at[:, idx].set(data.obs.astype(jnp.bfloat16)),
            teacher_action=agg.teacher_action.at[:, idx].set(
                data.teacher_action.astype(jnp.bfloat16)
            ),
            reset=agg.reset.at[:, idx].set(data.reset.astype(jnp.bfloat16)),
            size=jnp.minimum(agg.size + B, C),
        )

    return jax.jit(add, donate_argnums=(0,))


def make_optimizer(cfg: DistillConfig):
    """Adam, optionally with warmup-cosine LR over total_grad_steps."""
    if cfg.total_grad_steps > 0:
        warmup = max(1, int(cfg.total_grad_steps * cfg.lr_warmup_frac))
        sched = optax.warmup_cosine_decay_schedule(
            init_value=cfg.learning_rate * 0.1,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=cfg.total_grad_steps,
            end_value=cfg.learning_rate * cfg.lr_final_scale,
        )
        return optax.adam(sched)
    return optax.adam(cfg.learning_rate)


def make_train_from_aggregate(cfg: DistillConfig):
    """Jitted per-round trainer: `grad_steps_per_round` minibatch Adam steps,
    each sampling batch_size sequences uniformly from the aggregate's valid
    prefix and running full-sequence BPTT."""
    optim = make_optimizer(cfg)

    def train_round(student_params, opt_state, agg: Aggregate, key):
        def step(carry, k):
            params, opt = carry
            bidx = jax.random.randint(
                k, (cfg.batch_size,), 0, jnp.maximum(agg.size, 1)
            )
            obs = agg.obs[:, bidx].astype(jnp.float32)
            lab = agg.teacher_action[:, bidx].astype(jnp.float32)
            rst = agg.reset[:, bidx].astype(jnp.float32)
            loss, grads = jax.value_and_grad(bptt_loss)(params, obs, lab, rst)
            updates, opt = optim.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt), loss

        (student_params, opt_state), losses = jax.lax.scan(
            step,
            (student_params, opt_state),
            jax.random.split(key, cfg.grad_steps_per_round),
        )
        return student_params, opt_state, losses

    return jax.jit(train_round), optim


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
    relabel_fn = make_relabel(env) if cfg.fused_collect else None
    aggregated = cfg.aggregate_capacity > 0 and cfg.grad_steps_per_round > 0
    if aggregated:
        agg = aggregate_init(cfg)
        agg_add = make_aggregate_add(cfg)
        train_round, optim = make_train_from_aggregate(cfg)
    else:
        train_epoch, optim = make_train_epoch(cfg)
    opt_state = optim.init(student)
    env_params = broadcast_airframe_to_envs(airframes, cfg.envs_per_teacher)

    loss_history = []
    grad_step = 0
    env_steps = 0
    for r in range(n_rounds):
        key, k_collect, k_add, k_epoch = jax.random.split(key, 4)
        beta = teacher_mix(cfg, r)
        if cfg.fused_collect and beta == 0.0:
            data = fused_collect_round(
                student, teacher_actors, env_params, k_collect, env, cfg,
                relabel_fn,
            )
        else:
            data = collect(student, teacher_actors, env_params, k_collect, beta)
        env_steps += cfg.rollout_length * data.obs.shape[1]
        if aggregated:
            agg = agg_add(agg, data, k_add)
            student, opt_state, losses = train_round(
                student, opt_state, agg, k_epoch
            )
            losses = jax.device_get(losses)
            if log_fn is not None:
                # log a decimated loss series (full series = one point per
                # gradient step, like the reference's `loss` tag)
                stride = max(1, len(losses) // 64)
                for j in range(0, len(losses), stride):
                    log_fn("loss", float(losses[j]), grad_step + j)
            grad_step += len(losses)
            if log_fn is not None:
                # true optimizer-step counter (the loss series above is
                # decimated; compare_baseline prefers this tag)
                log_fn("gradient_steps", float(grad_step), env_steps)
            loss_history.append(float(losses[-1]))
        else:
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
