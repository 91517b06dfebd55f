"""Population teacher training: the reference's 1000-process SAC farm as ONE
sharded program.

Reference (SURVEY §1, §4.3): `foundation_policy_pre_training` trains one SAC
teacher per sampled airframe, 1000 instances launched via `seq 0 999 |
xargs` as separate OS processes with the filesystem as the only
communication (README:207). TPU-native redesign (SURVEY §3.7): the
population is a vmapped axis K over the *entire* trainer state — K tiny SAC
learners, each with its own airframe and N_per envs, advance in lockstep as
one XLA program, shardable over the 'pop' mesh axis.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from raptor_tpu.env.quad import L2F
from raptor_tpu.env.randomization import RandomizationConfig, sample_dynamics_params
from raptor_tpu.env.types import DynamicsParams
from raptor_tpu.rl import evaluation, runner, sac


@dataclasses.dataclass(frozen=True)
class PopulationConfig:
    n_teachers: int = 8  # K (reference: 1000)
    envs_per_teacher: int = 32
    rollout_length: int = 16
    gradient_steps: int = 16
    batch_size: int = 256
    replay_capacity: int = 4096
    warmup_super_steps: int = 8
    sample_rows: bool = False  # row-contiguous replay sampling (see replay.py)


def sample_teacher_airframes(
    key: jax.Array,
    n_teachers: int,
    config: RandomizationConfig = RandomizationConfig(),
) -> DynamicsParams:
    """K airframes, one per teacher — the JSON-file population of the
    reference (`dynamics_parameters/{0..999}.json`, README:206-207) as a
    stacked pytree."""
    return jax.vmap(lambda k: sample_dynamics_params(k, config))(
        jax.random.split(key, n_teachers)
    )


def broadcast_airframe_to_envs(params: DynamicsParams, n_envs: int) -> DynamicsParams:
    """[K, ...] airframes -> [K, N, ...] (each teacher trains on N copies of
    its own airframe)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(
            x[:, None], (x.shape[0], n_envs) + x.shape[1:]
        ),
        params,
    )


def population_init(
    key: jax.Array,
    env: L2F,
    airframes: DynamicsParams,  # [K]
    pop_cfg: PopulationConfig,
    sac_cfg: sac.SACConfig = sac.SACConfig(),
):
    """Vmapped trainer_init over the population axis."""
    run_cfg = runner.RunnerConfig(
        n_envs=pop_cfg.envs_per_teacher,
        rollout_length=pop_cfg.rollout_length,
        gradient_steps=pop_cfg.gradient_steps,
        batch_size=pop_cfg.batch_size,
        replay_capacity=pop_cfg.replay_capacity,
        sample_rows=pop_cfg.sample_rows,
    )
    env_params = broadcast_airframe_to_envs(airframes, pop_cfg.envs_per_teacher)
    keys = jax.random.split(key, pop_cfg.n_teachers)
    states = jax.vmap(
        lambda k, p: runner.trainer_init(k, env, p, run_cfg, sac_cfg)
    )(keys, env_params)
    return states, env_params, run_cfg


def make_population_super_step(
    env: L2F,
    run_cfg: runner.RunnerConfig,
    sac_cfg: sac.SACConfig,
):
    """jit(vmap(collect+train)) — one program advancing all K teachers."""

    def member_step(state, params):
        state = runner.collect(state, env, params, run_cfg)
        state, metrics = runner.train(state, run_cfg, sac_cfg)
        return state, metrics

    return jax.jit(jax.vmap(member_step), donate_argnums=(0,))


def make_population_multi_step(
    env: L2F,
    run_cfg: runner.RunnerConfig,
    sac_cfg: sac.SACConfig,
    n_inner: int,
    unroll: bool = True,
):
    """`n_inner` population super-steps inside ONE jitted call.

    Per-call dispatch latency (tens of ms through a remote-device tunnel)
    dominates small super-steps; batching amortizes it n_inner-fold. Returns
    the metrics of the last inner step.

    unroll=True Python-unrolls the inner loop instead of carrying the
    trainer state through a lax.scan: a scan carry containing the replay
    ring ([K, capacity, N, 68] — ~1.7 GB at K=128) is double-buffered by
    XLA's while-loop copy insertion, costing a full HBM copy per inner
    step; unrolled, the buffer updates can alias in place. Compile time
    grows ~n_inner-fold (one-time, cached). Measured on TPU v5e
    (artifacts/profile_unroll.json): 0.0915 -> 0.0692 s/super-step at
    K=128 x 10 inner = 1.32x — default True."""

    def member_step(state, params):
        state = runner.collect(state, env, params, run_cfg)
        state, metrics = runner.train(state, run_cfg, sac_cfg)
        return state, metrics

    v_step = jax.vmap(member_step)

    if unroll:

        def multi(states, env_params):
            for _ in range(n_inner):
                states, metrics = v_step(states, env_params)
            return states, metrics

    else:

        def multi(states, env_params):
            def body(states, _):
                states, metrics = v_step(states, env_params)
                return states, None

            states, _ = jax.lax.scan(body, states, None, length=n_inner - 1)
            return v_step(states, env_params)

    return jax.jit(multi, donate_argnums=(0,))


def make_population_demo_collect(
    env: L2F, run_cfg: runner.RunnerConfig, adaptive: bool = False
):
    """jit(vmap(collect_scripted)) — one demonstration-collection step for
    every teacher (DDPGfD replay seeding, MIGRATION §6 lever 1b)."""

    def member(state, params):
        return runner.collect_scripted(state, env, params, run_cfg, adaptive)

    return jax.jit(jax.vmap(member), donate_argnums=(0,))


def make_population_warmup(env: L2F, run_cfg: runner.RunnerConfig):
    def member_warmup(state, params):
        return runner.collect(state, env, params, run_cfg, random_actions=True)

    return jax.jit(jax.vmap(member_warmup), donate_argnums=(0,))


def make_population_eval(env: L2F, n_eval_envs: int, episode_length: int):
    """Per-teacher deterministic eval on its own airframe: returns the
    5-stat tuple per member."""

    def member_eval(sac_state, airframe, key):
        p_eval = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_eval_envs,) + x.shape), airframe
        )
        step_fn, carry = evaluation.mlp_policy_step(sac_state.actor)
        return evaluation.evaluate(
            env, p_eval, step_fn, carry, key, n_eval_envs, episode_length
        )

    return jax.jit(jax.vmap(member_eval, in_axes=(0, 0, 0)))


def train_population(
    key: jax.Array,
    env: L2F,
    pop_cfg: PopulationConfig,
    sac_cfg: sac.SACConfig,
    n_super_steps: int,
    rand_cfg: RandomizationConfig = RandomizationConfig(),
    log_fn=None,
    eval_every: int = 0,
) -> Tuple:
    """End-to-end population pre-training. Returns (sac_states [K], airframes
    [K])."""
    k_air, k_init, k_eval = jax.random.split(key, 3)
    airframes = sample_teacher_airframes(k_air, pop_cfg.n_teachers, rand_cfg)
    states, env_params, run_cfg = population_init(
        k_init, env, airframes, pop_cfg, sac_cfg
    )
    warmup = make_population_warmup(env, run_cfg)
    super_step = make_population_super_step(env, run_cfg, sac_cfg)
    evaluator = (
        make_population_eval(env, 8, env.EPISODE_LENGTH) if eval_every else None
    )

    for _ in range(pop_cfg.warmup_super_steps):
        states = warmup(states, env_params)
    for i in range(n_super_steps):
        states, metrics = super_step(states, env_params)
        if log_fn is not None:
            log_fn(i, metrics)
        if eval_every and (i + 1) % eval_every == 0 and log_fn is not None:
            stats = evaluator(
                states.sac, airframes, jax.random.split(k_eval, pop_cfg.n_teachers)
            )
            log_fn(i, stats)
    return states.sac, airframes
