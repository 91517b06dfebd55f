"""CLI: profile the population pre-training super-step (VERDICT r2 item 3).

Teacher pre-training is ~94% of the TPU budget for a flagship run (a
K=128 x 30.7M-step wave = ~2h on one v5e chip vs ~10 min for the
distillation it feeds) and had never been profiled. This app measures the
marginal cost per super-step (NOTES.md methodology: device->host readback
sync, difference between two dispatch counts) for a grid of variants:

  - K-scaling: does doubling the population double wall-clock, or are the
    tiny 64x64 learner matmuls underutilizing the chip (if so, a K=256
    wave trains 2x the teachers for <2x the time at IDENTICAL per-teacher
    quality — the win is per-teacher throughput, no quality tradeoff)?
  - collect vs train split: which half dominates?
  - batch-size / gradient-steps shape at fixed sample-reuse ratio.

    python -m raptor_tpu.apps.profile_pretraining --out artifacts/profile_pretraining.json

Each variant is its own XLA program: first run pays a cold axon compile
per variant (minutes), reruns are cached.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp


def _sync(tree) -> float:
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def _time_marginal(fn, state0, n_lo, n_hi):
    """fn must be state -> state-like (donated chain); returns (s/call,
    final_state)."""
    s = fn(state0)  # compile + warm
    _sync(s)
    t0 = time.perf_counter()
    for _ in range(n_lo):
        s = fn(s)
    _sync(s)
    t1 = time.perf_counter()
    for _ in range(n_hi):
        s = fn(s)
    _sync(s)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo), s


def profile_variant(
    name: str,
    n_teachers: int,
    envs_per_teacher: int = 32,
    rollout_length: int = 16,
    gradient_steps: int = 16,
    batch_size: int = 256,
    replay_capacity: int = 1536,
    steps_per_call: int = 10,
    mode: str = "full",  # full | collect | train
    unroll: bool = False,
    sample_rows: bool = False,
    n_lo: int = 1,
    n_hi: int = 4,
    sac_kwargs: dict | None = None,
) -> dict:
    from raptor_tpu.distill import population
    from raptor_tpu.env import EnvConfig, L2F
    from raptor_tpu.rl import runner, sac

    env = L2F(EnvConfig())
    pop_cfg = population.PopulationConfig(
        n_teachers=n_teachers,
        envs_per_teacher=envs_per_teacher,
        rollout_length=rollout_length,
        gradient_steps=gradient_steps,
        batch_size=batch_size,
        replay_capacity=replay_capacity,
        warmup_super_steps=1,
        sample_rows=sample_rows,
    )
    sac_cfg = sac.SACConfig(**(sac_kwargs or {}))
    airframes = population.sample_teacher_airframes(
        jax.random.key(0), n_teachers
    )
    states, env_params, run_cfg = population.population_init(
        jax.random.key(1), env, airframes, pop_cfg, sac_cfg
    )
    warmup = population.make_population_warmup(env, run_cfg)
    states = warmup(states, env_params)

    if mode == "full":
        step = population.make_population_multi_step(
            env, run_cfg, sac_cfg, steps_per_call, unroll=unroll
        )
        fn = lambda s: step(s, env_params)[0]
    elif mode == "collect":

        def member(state, params):
            for _ in range(steps_per_call):
                state = runner.collect(state, env, params, run_cfg)
            return state

        step = jax.jit(jax.vmap(member), donate_argnums=(0,))
        fn = lambda s: step(s, env_params)
    elif mode == "train":

        def member(state, params):
            for _ in range(steps_per_call):
                state, _ = runner.train(state, run_cfg, sac_cfg)
            return state

        step = jax.jit(jax.vmap(member), donate_argnums=(0,))
        fn = lambda s: step(s, env_params)
    else:
        raise ValueError(mode)

    per_call, _ = _time_marginal(fn, states, n_lo, n_hi)
    per_super_step = per_call / steps_per_call
    env_steps = n_teachers * envs_per_teacher * rollout_length
    # a 30.7M-env-steps/teacher wave needs this many super-steps:
    wave_super_steps = 30.7e6 / (envs_per_teacher * rollout_length)
    return {
        "variant": name,
        "mode": mode,
        "teachers": n_teachers,
        "envs_per_teacher": envs_per_teacher,
        "rollout_length": rollout_length,
        "gradient_steps": gradient_steps,
        "batch_size": batch_size,
        "steps_per_call": steps_per_call,
        "s_per_super_step": per_super_step,
        "env_steps_per_s": env_steps / per_super_step,
        "teacher_env_steps_per_s_per_teacher": (
            envs_per_teacher * rollout_length / per_super_step
        ),
        "wave_30M_wall_clock_h": per_super_step * wave_super_steps / 3600,
        "teachers_per_hour_at_30M": (
            n_teachers / (per_super_step * wave_super_steps / 3600)
        ),
    }


def count_flops(
    envs_per_teacher: int = 32,
    rollout_length: int = 16,
    gradient_steps: int = 16,
    batch_size: int = 256,
) -> dict:
    """Per-super-step FLOP count per teacher from XLA's cost analysis.

    XLA counts a lax.scan body ONCE regardless of trip count (verified:
    gradient_steps 1 vs 16 report identical flops), so the super-step
    cannot be counted whole. Instead the two scan-free bodies — one SAC
    gradient update and one (actor-sample + env.step) collect step — are
    lowered and counted directly, then scaled by their trip counts
    analytically. vmap FLOPs scale exactly linearly in K. Used to place
    the measured s_per_super_step on the roofline (artifacts/
    roofline.json: measured VPU f32 peak 4.51 TF/s)."""
    from raptor_tpu.env import EnvConfig, L2F, sample_population
    from raptor_tpu.rl import networks, sac

    env = L2F(EnvConfig())
    sac_cfg = sac.SACConfig()
    obs_dim, act_dim = env.OBSERVATION_DIM, env.ACTION_DIM
    state = sac.sac_init(jax.random.key(0), obs_dim, act_dim, sac_cfg)

    def _flops(fn, *args):
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops", 0.0))

    batch = (
        jnp.zeros((batch_size, obs_dim)),
        jnp.zeros((batch_size, act_dim)),
        jnp.zeros((batch_size,)),
        jnp.zeros((batch_size, obs_dim)),
        jnp.zeros((batch_size,)),
    )
    grad_flops = _flops(
        lambda s, k, b: sac.sac_update(s, k, b, sac_cfg),
        state, jax.random.key(1), batch,
    )

    params = sample_population(jax.random.key(2), envs_per_teacher)
    _, v_step = env.vector_ops()
    es, obs0 = jax.jit(jax.vmap(env.reset, in_axes=(0, 0)))(
        jax.random.split(jax.random.key(3), envs_per_teacher), params
    )

    def collect_step(actor, key, es, obs):
        action, _ = networks.actor_sample(actor, key, obs)
        return v_step(params, es, action)

    collect_flops = _flops(
        collect_step, state.actor, jax.random.key(4), es, obs0
    )

    per_teacher = (
        gradient_steps * grad_flops + rollout_length * collect_flops
    )
    return {
        "grad_step_flops": grad_flops,
        "collect_step_flops": collect_flops,
        "gradient_steps": gradient_steps,
        "rollout_length": rollout_length,
        "flops_per_super_step_per_teacher": per_teacher,
    }


VARIANTS = [
    ("k128_full", dict(n_teachers=128)),
    ("k256_full", dict(n_teachers=256)),
    ("k128_collect_only", dict(n_teachers=128, mode="collect")),
    ("k128_train_only", dict(n_teachers=128, mode="train")),
    # same sample-reuse ratio (batch x gsteps const), half the scan length
    ("k128_batch512_g8", dict(n_teachers=128, batch_size=512,
                              gradient_steps=8)),
    ("k128_spc40", dict(n_teachers=128, steps_per_call=40)),
    # inner loop unrolled: does killing the scan carry's replay-ring
    # double-buffering recover the 38% full-vs-parts overhead?
    ("k128_unroll10", dict(n_teachers=128, unroll=True)),
    # --- round-4 learner fast path (VERDICT r3 weak #1) ---
    # bf16/MXU matmuls alone
    ("k128_bf16_unroll10", dict(
        n_teachers=128, unroll=True,
        sac_kwargs=dict(compute_dtype="bfloat16"))),
    # op-count reducers alone (numerically identical to f32 baseline)
    ("k128_stackflat_unroll10", dict(
        n_teachers=128, unroll=True,
        sac_kwargs=dict(stack_critics=True, flat_optim=True))),
    # everything on — the candidate production config
    ("k128_fastpath_unroll10", dict(
        n_teachers=128, unroll=True,
        sac_kwargs=dict(compute_dtype="bfloat16", stack_critics=True,
                        flat_optim=True))),
    # --- round-4 sampling fix: the probe measured the random (t, e)
    # replay gather at ~88% of the train phase (sample_only_16 =
    # 0.047 s of the 0.053 s train-only super-step). Row-contiguous
    # sampling replaces 256 element gathers with 8 row slices.
    ("k128_rowsample_unroll10", dict(
        n_teachers=128, unroll=True, sample_rows=True)),
    # rows + the op-count reducers (candidate production config v2)
    ("k128_rowsample_fastpath_unroll10", dict(
        n_teachers=128, unroll=True, sample_rows=True,
        sac_kwargs=dict(stack_critics=True, flat_optim=True))),
    # post-fix decomposition: what does the train phase cost once the
    # gather is gone?
    ("k128_rowsample_train_only", dict(
        n_teachers=128, mode="train", sample_rows=True)),
    # bf16 retest now that the gather no longer masks the matmuls
    ("k128_rowsample_bf16_unroll10", dict(
        n_teachers=128, unroll=True, sample_rows=True,
        sac_kwargs=dict(compute_dtype="bfloat16"))),
    # --- round-5 K-geometry retest under rows (VERDICT r4 weak #4): the
    # round-3 "K=256 gives no per-teacher gain (chip saturated)"
    # conclusion predates the gather fix — the chip was saturated BY the
    # gather. Re-measure whether the population axis now scales.
    ("k256_rowsample_unroll10", dict(
        n_teachers=256, unroll=True, sample_rows=True)),
    ("k512_rowsample_unroll10", dict(
        n_teachers=512, unroll=True, sample_rows=True,
        replay_capacity=1024)),
    # collect share under rows (was 4% pre-fix; if train got 1.88x faster
    # the split moved)
    ("k128_rowsample_collect_only", dict(
        n_teachers=128, mode="collect", sample_rows=True)),
]


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default=None,
                   help="comma-separated subset of variant names")
    p.add_argument("--flops-only", action="store_true",
                   help="only run the XLA cost-analysis FLOP count "
                        "(platform independent — safe on CPU while the "
                        "TPU is busy) and merge it into --out if present")
    p.add_argument("--out", default=None, help="JSON report path")
    args = p.parse_args(argv)

    if args.flops_only:
        flops = count_flops()
        report = {}
        if args.out and os.path.exists(args.out):
            with open(args.out) as f:
                report = json.load(f)
        report["flops"] = flops
        # roofline placement for every timed full-mode row present
        peak_vpu = 4.51e12  # measured, artifacts/roofline.json
        for r in report.get("rows", []):
            if r.get("mode") == "full" and "s_per_super_step" in r:
                total = flops["flops_per_super_step_per_teacher"] * r["teachers"]
                r["achieved_tflops"] = total / r["s_per_super_step"] / 1e12
                r["vpu_f32_roofline_fraction"] = (
                    total / r["s_per_super_step"] / peak_vpu
                )
        print(json.dumps(report, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
        return report

    chosen = (
        set(args.variants.split(",")) if args.variants else
        {n for n, _ in VARIANTS}
    )
    rows = []
    for name, kw in VARIANTS:
        if name not in chosen:
            continue
        print(f"profiling {name} ...", flush=True)
        try:
            row = profile_variant(name, **kw)
        except Exception as e:  # noqa: BLE001 — report and continue
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    report = {"platform": jax.devices()[0].platform, "rows": rows}
    full = {r["variant"]: r for r in rows if "s_per_super_step" in r}
    if "k128_full" in full and "k256_full" in full:
        report["k_scaling_cost_ratio"] = (
            full["k256_full"]["s_per_super_step"]
            / full["k128_full"]["s_per_super_step"]
        )
    if "k128_full" in full and "k128_collect_only" in full and \
            "k128_train_only" in full:
        t = full["k128_full"]["s_per_super_step"]
        report["collect_share"] = (
            full["k128_collect_only"]["s_per_super_step"] / t
        )
        report["train_share"] = (
            full["k128_train_only"]["s_per_super_step"] / t
        )
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
