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
import math
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
    # --- sample-efficiency controls (VERDICT r2 item 1): the reference
    # collects only ~470k env-steps/round (75.3M / 160 rounds, SURVEY §6.2);
    # subsampling the teacher population per round matches that budget
    # without shrinking the population.
    teachers_per_round: int = 0  # 0 = use all K teachers every round
    # --- observation standardization (reference nn/layers/standardize,
    # README:114 — part of the reference's *training* include set; invisible
    # in the shipped checkpoint because folding it into dense_0 is exact).
    # Fitted on the round-0 (teacher-driven) data, frozen afterwards, folded
    # into the exported/evaluated student (policy.network.fold_norm).
    standardize: bool = False
    # --- per-round loss decomposition (VERDICT r2 item 2)
    diagnostics: bool = False
    # --- student capacity ablation (round 4): GRU width of the distilled
    # student. 16 = the reference architecture (2,084 params, ckpt.h:134)
    # and the only value with checkpoint parity; other widths answer
    # whether the pi-start ceiling is model capacity (every other lever —
    # population size, teacher budget, collect severity, teacher-init
    # severity — measured a plateau at ~320/500).
    student_hidden: int = 16
    # --- demonstration injection (round 4, docs/MIGRATION.md §6 lever 1a):
    # collect states whose body-z tilt exceeds this threshold (rad) are
    # labeled by the scripted geometric recovery controller
    # (env.recovery.recovery_action) instead of the SAC teacher. The
    # failure-mode probe proved teachers flip 3-4x slower than the box
    # demands because SAC never explored the fast flip; the scripted
    # demonstrator already beats every learned policy at pi starts
    # (artifacts/scripted_recovery.json: 28.5% vs ~39% termination).
    # 0 = off (labels are pure teacher actions, reference behavior).
    # Note (ADVICE r4): during beta-mixed collect rounds the label is also
    # the EXECUTED action, so severe states additionally roll out under the
    # scripted controller for the beta fraction of steps.
    demo_tilt: float = 0.0
    # Rate criterion for demo labels (round 5): the demoDiag instrumented
    # run measured severe_frac 12-26% and loss_severe ~5x BELOW loss_hover
    # — labels are plentiful and well-fit, so the null result must live in
    # the COMPOSITE policy: with a tilt-only switch, mid-recovery arrest
    # states (tilt already < demo_tilt but |w| ~ 8-10 rad/s) take teacher
    # labels, and teachers never visit high-rate states. demo_rate > 0
    # extends the demo-label criterion to tilt > demo_tilt OR |w| >
    # demo_rate, covering the demonstrator's own arrest phase.
    demo_rate: float = 0.0
    # --- demonstrator-DRIVEN collect episodes (round 5, VERDICT r4 item 1):
    # the round-4 demo640 run measured ~null because labels were only
    # attached to states the STUDENT visits — and a student that cannot
    # flip never visits the expert's mid-recovery states (DAgger needs
    # state coverage under a competent controller). This routes the first
    # round(frac * M) envs of every teacher's block to execute the
    # scripted demonstrator for the WHOLE collect (all rounds, independent
    # of beta): their trajectories traverse the full flip-arrest-hover
    # sequence, labeled demo-above-tilt / teacher-below as usual.
    demo_rollout_frac: float = 0.0
    # per-airframe adaptive demonstrator gain caps (env.recovery.
    # adaptive_gain_caps; MIGRATION §6 lever 3) for both labels and
    # demo-driven execution.
    demo_adaptive: bool = False
    # demonstrator gains. Defaults are the round-4 fixed-gain sweep
    # optimum (28.5% agg / 14.5% cf at pi, artifacts/scripted_recovery
    # .json). The round-5 PHYSICS-PURE mode (adaptive with w_cap/k_w set
    # effectively unbounded so the per-airframe physics caps alone govern,
    # c_flip 0.65 / c_lag 0.8 / c_bw 2.0) measured 26.9% agg / 5.1% cf
    # (artifacts/scripted_recovery_physpure.json) — the labeler should use
    # whatever demonstrator currently wins that sweep.
    demo_w_cap: float = 10.0
    demo_k_w: float = 30.0
    demo_c_flip: float = 1.0
    demo_c_lag: float = 0.8
    demo_c_bw: float = 1.5
    # --- severe-state loss weighting (round 5): frames whose tilt exceeds
    # severe_tilt get weight severe_weight in the BPTT MSE (normalized by
    # total weight). 1.0 = off. Tilt is read from the stored observation's
    # rotation-matrix R22 channel (obs[..., 11]), so no schema change.
    severe_weight: float = 1.0
    severe_tilt: float = 1.2


class RoundData(NamedTuple):
    """One collected round: [T, K*M, ...] sequences."""

    obs: jnp.ndarray  # [T, B, 22] policy observations
    teacher_action: jnp.ndarray  # [T, B, 4]
    reset: jnp.ndarray  # [T, B] 1.0 where the env was freshly reset


def identity_norm(obs_dim: int = POLICY_OBS_DIM) -> dict:
    return {
        "mean": jnp.zeros((obs_dim,), jnp.float32),
        "std": jnp.ones((obs_dim,), jnp.float32),
    }


def fit_norm(obs: jnp.ndarray, std_floor: float = 1e-2) -> dict:
    """Observation normalizer from collected data (obs [..., 22]); the std
    floor keeps near-constant components (e.g. a zero prev-action channel at
    episode starts) from exploding the scale."""
    flat = obs.reshape(-1, obs.shape[-1])
    return {
        "mean": jnp.mean(flat, axis=0),
        "std": jnp.maximum(jnp.std(flat, axis=0), std_floor),
    }


def _norm_obs(obs: jnp.ndarray, norm) -> jnp.ndarray:
    if norm is None:
        return obs
    return (obs - norm["mean"]) / norm["std"]


def teacher_mix(cfg: DistillConfig, round_idx: int) -> float:
    if cfg.teacher_mix_decay_rounds <= 0:
        return cfg.teacher_mix_final
    frac = min(1.0, round_idx / cfg.teacher_mix_decay_rounds)
    return cfg.teacher_mix_initial + frac * (
        cfg.teacher_mix_final - cfg.teacher_mix_initial
    )


def make_demo_fn(cfg: DistillConfig):
    """Vmapped scripted-demonstrator action fn for this config's gain mode."""
    from raptor_tpu.env.recovery import recovery_action

    return jax.vmap(
        functools.partial(
            recovery_action,
            adaptive=cfg.demo_adaptive,
            w_cap=cfg.demo_w_cap,
            k_w=cfg.demo_k_w,
            c_flip=cfg.demo_c_flip,
            c_lag=cfg.demo_c_lag,
            c_bw=cfg.demo_c_bw,
        ),
        in_axes=(0, 0),
    )


def make_labeler(env: L2F, cfg: DistillConfig):
    """Label function for one collect step: (teacher_actors [K],
    flat_params [K*M], obs_full [K*M, D], state [K*M]) -> labels [K*M, 4].

    Pure teacher mean actions by default; with cfg.demo_tilt > 0, states
    tilted beyond the threshold take the scripted recovery demonstrator's
    action instead (demonstration injection, docs/MIGRATION.md §6 —
    privileged state access is fine here: labels are training targets,
    the student still only sees the 22-dim policy obs). During beta-mixed
    collect rounds the label is ALSO the executed action (ADVICE r4), an
    intentional DAgger-with-expert property.

    `env` pins the expected privileged obs width (shape sanity only);
    `demo_act` lets make_collect reuse one demonstrator evaluation for
    both labeling and demo-driven execution."""
    from raptor_tpu.env.recovery import tilt_angle

    v_demo = make_demo_fn(cfg)
    v_tilt = jax.vmap(tilt_angle)
    obs_dim = env.OBSERVATION_DIM

    def label_fn(teacher_actors, flat_params, obs_full, state, demo_act=None):
        assert obs_full.shape[-1] == obs_dim, (
            f"labeler expects the privileged obs ({obs_dim}), "
            f"got {obs_full.shape[-1]}"
        )
        # obs_full [K*M, D] -> per-teacher mean action via vmap over K
        KM = obs_full.shape[0]
        K = jax.tree.leaves(teacher_actors)[0].shape[0]
        obs_k = obs_full.reshape(K, KM // K, -1)
        act_k = jax.vmap(networks.actor_mean)(teacher_actors, obs_k)
        label = act_k.reshape(KM, -1)
        if cfg.demo_tilt > 0.0:
            if demo_act is None:
                demo_act = v_demo(flat_params, state)
            severe = v_tilt(state.orientation) > cfg.demo_tilt
            if cfg.demo_rate > 0.0:
                severe = severe | (
                    jnp.sum(state.angular_velocity**2, axis=-1)
                    > cfg.demo_rate**2
                )
            label = jnp.where(severe[:, None], demo_act, label)
        return label

    return label_fn


def make_collect(env: L2F, cfg: DistillConfig):
    """Jitted round-collection: (student_params, teacher_actors [K],
    env_params [K, M], key, beta) -> RoundData."""
    _, v_step = env.vector_ops()
    v_reset = jax.vmap(env.reset, in_axes=(0, 0))
    label_fn = make_labeler(env, cfg)
    use_demo = cfg.demo_tilt > 0.0 or cfg.demo_rollout_frac > 0.0
    v_demo = make_demo_fn(cfg) if use_demo else None

    def collect(student_params, teacher_actors, env_params, key, beta,
                norm=None):
        k_reset, k_scan = jax.random.split(key)
        k_shape = jax.tree.leaves(env_params)[0].shape  # (K, M, ...)
        K, M = k_shape[0], k_shape[1]
        flat_params = jax.tree.map(
            lambda x: x.reshape((K * M,) + x.shape[2:]), env_params
        )
        # demonstrator-driven envs: the first d of each teacher's M-block
        # execute the scripted expert for the whole collect (state coverage
        # of the recovery trajectory; labels stay demo-above-tilt /
        # teacher-below as for every other env)
        d_per = int(round(cfg.demo_rollout_frac * M))
        demo_driven = ((jnp.arange(K * M) % M) < d_per)[:, None]
        es, obs = v_reset(jax.random.split(k_reset, K * M), flat_params)
        h0 = student_net.initial_hidden(student_params, K * M)

        def body(carry, key_t):
            es, obs, h = carry
            h_new, student_action = student_net.apply_step(
                student_params, h, _norm_obs(obs[..., :POLICY_OBS_DIM], norm)
            )
            demo_act = v_demo(flat_params, es.dynamics) if use_demo else None
            label = label_fn(teacher_actors, flat_params, obs, es.dynamics,
                             demo_act)
            use_teacher = (
                jax.random.uniform(key_t, (K * M, 1)) < beta
            ).astype(jnp.float32)
            action = use_teacher * label + (1.0 - use_teacher) * jnp.clip(
                student_action, -1.0, 1.0
            )
            if d_per > 0:
                action = jnp.where(demo_driven, demo_act, action)
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
    different master seeds give different reset streams).

    RETIRED from the production `distill()` loop (VERDICT r2 item 7): the
    kernel measured 0.6x the XLA collect at the production workload
    (artifacts/bench_collect_r02.json) and collect is not the distillation
    bottleneck (training is). Kept as a benchmarked in-kernel closed-loop
    demonstration — `apps/bench_collect.py` drives it and the parity tests
    in tests/test_pallas_collect.py pin it against the XLA path."""
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


def bptt_actions(student_params, obs, reset, norm=None):
    """Student actions over a [T, B] batch of sequences with reset-masked
    hidden carry.

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
    _, actions = jax.lax.scan(step, h0, (_norm_obs(obs, norm), entering_reset))
    return actions


# rotation-matrix R22 channel of the 22-dim policy obs (position 3 dims,
# then row-major R at 3..11): tilt > t  <=>  obs[..., 11] < cos(t)
_R22 = 11


def severe_mask(obs: jnp.ndarray, tilt: float) -> jnp.ndarray:
    """Boolean [...,]: frames whose body-z tilt exceeds `tilt` rad, read
    directly from the RAW (un-normalized) stored policy observation."""
    return obs[..., _R22] < math.cos(tilt)


def bptt_loss(student_params, obs, teacher_action, reset, norm=None,
              severe_weight: float = 1.0, severe_tilt: float = 1.2):
    """Scalar MSE of bptt_actions vs teacher labels.

    With severe_weight != 1, frames tilted past severe_tilt get that
    weight in a weight-normalized MSE (round-5 lever: the demo-labeled
    severe subset is a tiny fraction of mostly-hover frames, so the
    unweighted loss barely prices it)."""
    actions = bptt_actions(student_params, obs, reset, norm)
    err2 = (actions - teacher_action) ** 2
    if severe_weight != 1.0:
        w = jnp.where(severe_mask(obs, severe_tilt), severe_weight, 1.0)
        return jnp.sum(err2 * w[..., None]) / (
            jnp.maximum(jnp.sum(w), 1.0) * err2.shape[-1]
        )
    return jnp.mean(err2)


def make_diagnostics(env: L2F, n_probe_teachers: int = 8, probe_cols: int = 64,
                     severe_tilt: float = 1.2):
    """Per-round loss decomposition (VERDICT r2 item 2: the 17-20x gap
    between our final distillation loss and the reference tfevents'
    `loss`=0.022 needs a measured explanation).

    Returns two jitted probes:

    - fresh(student, RoundData, norm) -> {loss_fresh, mse_dim[4],
      severe_frac, severe_frac_probe, loss_severe, loss_hover}: the loss
      on the JUST-collected on-policy round (vs the reservoir mixture the
      training loss is computed on), its per-action-dim split, and the
      round-5 demo-injection instrumentation (VERDICT r4 item 1): what
      fraction of ALL collected frames is tilted past severe_tilt (i.e.
      would take a demo label), and the student's fit on that subset vs
      the hover rest.
    - disagreement(teacher_actors_sub [N], airframes_sub [N], obs [T,C,22])
      -> scalar: mean variance across N teachers each labeling the SAME
      policy-observations with its OWN privileged tail. The student only
      sees the 22-dim obs, so states that different airframes visit with
      the same policy-obs but different correct actions put an irreducible
      floor under the 22-obs-conditioned MSE — this measures that floor's
      scale directly.
    """

    def fresh(student_params, data: RoundData, norm=None):
        obs = data.obs[:, :probe_cols]
        lab = data.teacher_action[:, :probe_cols]
        rst = data.reset[:, :probe_cols]
        actions = bptt_actions(student_params, obs, rst, norm)
        err2 = (actions - lab) ** 2
        sev = severe_mask(obs, severe_tilt).astype(jnp.float32)  # [T, C]
        n_sev = jnp.sum(sev)
        per_frame = jnp.mean(err2, axis=-1)  # [T, C]
        return {
            "loss_fresh": jnp.mean(err2),
            "mse_dim": jnp.mean(err2, axis=(0, 1)),
            # fraction over the WHOLE round (not just probe columns):
            # counting is free and severe frames can be rare
            "severe_frac": jnp.mean(
                severe_mask(data.obs, severe_tilt).astype(jnp.float32)
            ),
            "severe_frac_probe": jnp.mean(sev),
            "loss_severe": jnp.sum(per_frame * sev) / jnp.maximum(n_sev, 1.0),
            "loss_hover": jnp.sum(per_frame * (1.0 - sev))
            / jnp.maximum(jnp.sum(1.0 - sev), 1.0),
        }

    def disagreement(teacher_actors_sub, airframes_sub, obs):
        tails = jax.vmap(env.privileged_tail)(airframes_sub)  # [N, 9]
        obs_p = obs[:, :probe_cols]

        def label_one(actor, tail):
            full = jnp.concatenate(
                [
                    obs_p,
                    jnp.broadcast_to(
                        tail, obs_p.shape[:-1] + (tail.shape[-1],)
                    ),
                ],
                axis=-1,
            )
            return networks.actor_mean(actor, full)  # [T, C, 4]

        labels = jax.vmap(label_one)(teacher_actors_sub, tails)  # [N,T,C,4]
        return jnp.mean(jnp.var(labels, axis=0))

    return jax.jit(fresh), jax.jit(disagreement)


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

    def train_round(student_params, opt_state, agg: Aggregate, key, norm=None):
        def step(carry, k):
            params, opt = carry
            bidx = jax.random.randint(
                k, (cfg.batch_size,), 0, jnp.maximum(agg.size, 1)
            )
            obs = agg.obs[:, bidx].astype(jnp.float32)
            lab = agg.teacher_action[:, bidx].astype(jnp.float32)
            rst = agg.reset[:, bidx].astype(jnp.float32)
            loss, grads = jax.value_and_grad(bptt_loss)(
                params, obs, lab, rst, norm,
                cfg.severe_weight, cfg.severe_tilt,
            )
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

    def train_epoch(student_params, opt_state, data: RoundData, key, norm=None):
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
            loss, grads = jax.value_and_grad(bptt_loss)(
                params, obs, lab, rst, norm,
                cfg.severe_weight, cfg.severe_tilt,
            )
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
    """Run the full distillation. Returns (student_params, loss_history).

    When cfg.standardize is set the returned params (and everything handed
    to round_hook) have the fitted normalizer folded into dense_0
    (policy.network.fold_norm — exact), so exports/evals see a plain
    reference-schema policy.
    """
    from raptor_tpu.distill.population import broadcast_airframe_to_envs

    k_init, key = jax.random.split(key)
    student = student_net.init_params(k_init, hidden_dim=cfg.student_hidden)
    collect = make_collect(env, cfg)
    aggregated = cfg.aggregate_capacity > 0 and cfg.grad_steps_per_round > 0
    if aggregated:
        agg = aggregate_init(cfg)
        agg_add = make_aggregate_add(cfg)
        train_round, optim = make_train_from_aggregate(cfg)
    else:
        train_epoch, optim = make_train_epoch(cfg)
    opt_state = optim.init(student)
    env_params = broadcast_airframe_to_envs(airframes, cfg.envs_per_teacher)

    # per-round teacher subsampling (VERDICT r2 item 1): collect from a
    # random K_sub-subset each round so the env-step budget per round
    # matches the reference's ~470k without shrinking the population the
    # aggregate ultimately covers.
    K_total = jax.tree.leaves(airframes)[0].shape[0]
    K_sub = cfg.teachers_per_round
    if K_sub and K_sub < K_total:

        @jax.jit
        def subsample(actors, params, k):
            idx = jax.random.choice(k, K_total, (K_sub,), replace=False)
            take = lambda t: jax.tree.map(lambda x: x[idx], t)
            return take(actors), take(params)

    else:
        subsample = None

    if cfg.diagnostics:
        diag_fresh, diag_disagree = make_diagnostics(
            env, severe_tilt=(cfg.demo_tilt if cfg.demo_tilt > 0.0
                              else cfg.severe_tilt)
        )
        n_probe = min(8, K_total)

        @jax.jit
        def probe_teachers(actors, frames, k):
            idx = jax.random.choice(k, K_total, (n_probe,), replace=False)
            take = lambda t: jax.tree.map(lambda x: x[idx], t)
            return take(actors), take(frames)

    norm = None
    folded = lambda p: (
        p if norm is None else student_net.fold_norm(p, norm["mean"],
                                                     norm["std"])
    )
    loss_history = []
    grad_step = 0
    env_steps = 0
    for r in range(n_rounds):
        key, k_collect, k_add, k_epoch, k_subs, k_diag = jax.random.split(
            key, 6
        )
        beta = teacher_mix(cfg, r)
        if subsample is not None:
            actors_r, params_r = subsample(teacher_actors, env_params, k_subs)
        else:
            actors_r, params_r = teacher_actors, env_params
        data = collect(student, actors_r, params_r, k_collect, beta, norm)
        if cfg.standardize and norm is None:
            # fit once on the round-0 (teacher-driven, beta=1) distribution,
            # frozen afterwards — matching a standardize layer fitted before
            # training rather than a running statistic.
            norm = fit_norm(data.obs)
        env_steps += cfg.rollout_length * data.obs.shape[1]
        if aggregated:
            agg = agg_add(agg, data, k_add)
            student, opt_state, losses = train_round(
                student, opt_state, agg, k_epoch, norm
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
                    student, opt_state, data, jax.random.fold_in(k_epoch, e),
                    norm
                )
                for loss in losses:
                    if log_fn is not None:
                        log_fn("loss", float(loss), grad_step)
                    grad_step += 1
                loss_history.append(float(losses[-1]))
        if cfg.diagnostics and log_fn is not None:
            fresh = diag_fresh(student, data, norm)
            p_actors, p_frames = probe_teachers(teacher_actors, airframes,
                                                k_diag)
            spread = diag_disagree(p_actors, p_frames, data.obs)
            log_fn("diagnostics/loss_fresh", float(fresh["loss_fresh"]),
                   grad_step)
            for d in range(4):
                log_fn(f"diagnostics/mse_dim{d}", float(fresh["mse_dim"][d]),
                       grad_step)
            log_fn("diagnostics/teacher_disagreement", float(spread),
                   grad_step)
            for tag in ("severe_frac", "severe_frac_probe", "loss_severe",
                        "loss_hover"):
                log_fn(f"diagnostics/{tag}", float(fresh[tag]), grad_step)
        if round_hook is not None:
            round_hook(r, folded(student), env_steps)
    return folded(student), loss_history
