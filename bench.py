"""North-star benchmark: vectorized l2f throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Four paths are measured (VERDICT r1 #6: carry the closed-loop numbers in
the default line, not just the flattest metric):

- fused_pallas_rollout: the Pallas fused-rollout kernel
  (ops/pallas_rollout.py) — the entire T-step RK4 dynamics rollout in VMEM,
  SoA layout, constant action (headline value);
- fused_policy_eval:    the Pallas closed-loop kernel (ops/pallas_eval.py) —
  shipped GRU policy + dynamics + reward + termination, whole episodes
  in-kernel (the semantically complete eval path);
- full_env_step_xla:    the full XLA env.step (dynamics + reward +
  termination + auto-reset) under lax.scan;
- train_env_steps_per_s: distillation throughput — student collect +
  teacher labels + BPTT gradient steps, env-steps/s of wall-clock incl.
  training. This is like-for-like with the only measured reference
  throughput: 10,580 env-steps/s for its post-training run (BASELINE.md).
- pretrain_env_steps_per_s: the SAC teacher-farm super-step (the
  reference's `seq 0 999 | xargs` process farm, README:207, as ONE
  vmapped program) at the exact production wave config — K=128 teachers,
  row-contiguous replay sampling, 10 unrolled inner steps per dispatch.
  This is ~94% of all TPU time in the full pipeline; round 4 moved it
  from 0.63M to ~1.6M env-steps/s (artifacts/profile_rowsample.json).

Design: the parent process imports NO jax. Each metric runs in its own
subprocess (`bench.py --sub <name>`), sequentially — so every measurement
is the sole TPU process (NOTES.md one-process rule) and a cold-cache
compile that overruns its timeout degrades that metric to null instead of
hanging the bench. Warm (persistent cache in .cache/xla) every metric is
seconds.
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_STEPS_PER_S = 10_580.0  # reference post-training run, BASELINE.md
N_ENVS = 16384
N_STEPS = 512
EVAL_STEPS = 500  # reference episode length

# (name, timeout_s) — timeouts sized for a cold axon remote-compile
# (Pallas kernels ~seconds; big XLA env graphs can take >10 min, NOTES.md).
SUBBENCHES = [
    ("fused_pallas_rollout", 900),
    # measured 2026-08-17: this sub's cold compile (16384-env reset + the
    # jitted pack->kernel->unpack eval pipeline) ran past 900 s through the
    # axon tunnel and degraded the metric to null — size for the worst case
    ("fused_policy_eval", 2400),
    ("full_env_step_xla", 1500),
    # production-shaped config (K=128): same three programs, sized for a
    # worst-case cold compile of the K-batched collect
    ("train_env_steps_per_s", 2400),
    # the production teacher-wave program (K=128, 10 unrolled inner steps):
    # identical to apps.pre_training's jitted super-step, so any wave run
    # this machine has done leaves it compile-cached; cold, the unrolled
    # multi-step is the slowest compile in the repo
    ("pretrain_env_steps_per_s", 2700),
]


def _small():
    """RAPTOR_BENCH_SMALL=1: tiny shapes for CPU smoke tests of the
    plumbing (the real numbers are only meaningful on TPU)."""
    return os.environ.get("RAPTOR_BENCH_SMALL") == "1"


# ---------------------------------------------------------------- metrics


def _init_jax():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".cache", "xla"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _env_and_pop(jax, n_envs):
    from raptor_tpu.env import EnvConfig, L2F, sample_population

    env = L2F(EnvConfig())
    kp, kr = jax.random.split(jax.random.key(0))
    params = sample_population(kp, n_envs)
    v_reset, _ = env.vector_ops()
    es, _ = jax.jit(v_reset)(jax.random.split(kr, n_envs), params)
    return env, params, es


def bench_fused_pallas_rollout():
    jax = _init_jax()
    import jax.numpy as jnp

    from raptor_tpu.env import dynamics
    from raptor_tpu.ops import pallas_rollout as pr

    n_envs, n_steps = (256, 64) if _small() else (N_ENVS, N_STEPS)
    _, params, es = _env_and_pop(jax, n_envs)
    pp = pr.pack_params(params)
    sp = pr.pack_state(es.dynamics)
    ha = jax.vmap(dynamics.hover_action)(params)
    ap = pr.pack_action(jnp.tile(ha[:, None], (1, 4)))
    out, _ = pr.fused_rollout_packed(pp, sp, ap, n_steps)
    float(jnp.sum(out[2]))  # warm + drain the queue

    # block_until_ready is unreliable through the axon tunnel (can return
    # before execution); a device->host readback is a hard sync. Fixed
    # per-batch overhead (tunnel RTT) cancels in the marginal cost between
    # two iteration counts.
    def timed(iters):
        t0 = time.perf_counter()
        o = sp
        for _ in range(iters):
            o, _ = pr.fused_rollout_packed(pp, o, ap, n_steps)
        float(jnp.sum(o[2]))  # hard sync
        return time.perf_counter() - t0

    lo, hi = 10, 40
    t_lo, t_hi = timed(lo), timed(hi)
    return n_envs * n_steps * (hi - lo) / max(t_hi - t_lo, 1e-9)


def bench_fused_policy_eval():
    """Closed-loop: shipped GRU policy + env, whole episodes in-kernel."""
    jax = _init_jax()
    import jax.numpy as jnp

    from raptor_tpu.checkpoint import h5
    from raptor_tpu.ops.pallas_eval import make_fused_policy_eval
    from raptor_tpu.policy import shipped_checkpoint_path

    n_envs, n_steps = (256, 32) if _small() else (N_ENVS, EVAL_STEPS)
    _, params, es = _env_and_pop(jax, n_envs)
    policy = h5.load_actor(shipped_checkpoint_path())
    run = make_fused_policy_eval(policy, n_steps)
    out = run(params, es.dynamics)
    float(jnp.sum(out[3]))

    def timed(iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(params, es.dynamics)
        float(jnp.sum(out[3]))
        return time.perf_counter() - t0

    lo, hi = 5, 20
    t_lo, t_hi = timed(lo), timed(hi)
    return n_envs * n_steps * (hi - lo) / max(t_hi - t_lo, 1e-9)


def bench_full_env_step_xla():
    jax = _init_jax()
    import jax.numpy as jnp

    n_envs, n_steps = (256, 64) if _small() else (N_ENVS, N_STEPS)
    env, params, es = _env_and_pop(jax, n_envs)
    _, v_step = env.vector_ops()

    @jax.jit
    def rollout(params, es):
        def body(es, _):
            es, obs, r, d, _ = v_step(params, es, jnp.zeros((n_envs, 4)))
            return es, (jnp.sum(r), jnp.sum(d))

        es, (rs, ds) = jax.lax.scan(body, es, None, length=n_steps)
        return es, jnp.sum(rs), jnp.sum(ds)

    es2, r, d = rollout(params, es)
    float(r)

    def timed(iters):
        t0 = time.perf_counter()
        e = es
        for _ in range(iters):
            e, r, _ = rollout(params, e)
        float(r)
        return time.perf_counter() - t0

    lo, hi = 2, 8
    t_lo, t_hi = timed(lo), timed(hi)
    return n_envs * n_steps * (hi - lo) / max(t_hi - t_lo, 1e-9)


def bench_train_env_steps_per_s():
    """Distillation pipeline throughput (the reference's 10,580 metric):
    collect (student GRU + teacher relabeling over a [K, M] population) +
    aggregate-add + BPTT minibatch gradient steps, measured as env-steps
    per second of total wall-clock."""
    jax = _init_jax()
    import jax.numpy as jnp

    from raptor_tpu.distill import population, post_training
    from raptor_tpu.env import EnvConfig, L2F
    from raptor_tpu.policy import network as student_net
    from raptor_tpu.rl import networks

    # production-shaped: the flagship distillations run K*M ~= 5120 envs
    # with ~2,804 env-steps per gradient step (913 gsteps / 2.56M steps per
    # round); a 16x8 toy config under-amortized dispatch and underreported
    # sustained throughput 2.6x (334k vs the 1024T run's measured ~875k)
    K, M, T, gsteps = (4, 4, 32, 4) if _small() else (128, 8, EVAL_STEPS, 183)
    env = L2F(EnvConfig())
    cfg = post_training.DistillConfig(
        envs_per_teacher=M,
        rollout_length=T,
        batch_size=min(64, K * M),
        aggregate_capacity=4 * K * M,
        grad_steps_per_round=gsteps,
        total_grad_steps=0,
    )
    airframes = population.sample_teacher_airframes(jax.random.key(1), K)
    teachers = jax.vmap(
        lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4, (64, 64))
    )(jax.random.split(jax.random.key(2), K))
    env_params = population.broadcast_airframe_to_envs(airframes, M)
    student = student_net.init_params(jax.random.key(3))
    collect = post_training.make_collect(env, cfg)
    add = post_training.make_aggregate_add(cfg)
    train, optim = post_training.make_train_from_aggregate(cfg)
    opt_state = optim.init(student)
    agg = post_training.aggregate_init(cfg)

    def one_round(student, opt_state, agg, i):
        data = collect(student, teachers, env_params, jax.random.key(10 + i), 0.5)
        agg = add(agg, data, jax.random.key(100 + i))
        student, opt_state, losses = train(
            student, opt_state, agg, jax.random.key(200 + i)
        )
        return student, opt_state, agg, losses

    student, opt_state, agg, losses = one_round(student, opt_state, agg, 0)
    float(jnp.sum(losses))  # warm all three programs

    def timed(rounds, i0):
        nonlocal student, opt_state, agg
        t0 = time.perf_counter()
        for i in range(rounds):
            student, opt_state, agg, losses = one_round(
                student, opt_state, agg, i0 + i
            )
        float(jnp.sum(losses))
        return time.perf_counter() - t0

    lo, hi = 1, 4
    t_lo, t_hi = timed(lo, 1), timed(hi, 2)
    return K * M * T * (hi - lo) / max(t_hi - t_lo, 1e-9)


def bench_pretrain_env_steps_per_s():
    """SAC teacher-farm throughput (aggregate env-steps/s across the
    population) at the exact production wave configuration — the program
    `apps.pre_training --population 128 --steps-per-call 10
    --replay-capacity 1536 --sample-rows` runs, so the persistent cache
    from any real wave makes this sub warm. Reference anchor: the
    1000-process xargs farm (SURVEY §4.3, README:207); ours is one
    vmapped program (distill/population.py)."""
    jax = _init_jax()
    import jax.numpy as jnp

    from raptor_tpu.distill import population
    from raptor_tpu.env import EnvConfig, L2F
    from raptor_tpu.rl import sac

    K, spc = (4, 2) if _small() else (128, 10)
    pop_cfg = population.PopulationConfig(
        n_teachers=K,
        envs_per_teacher=8 if _small() else 32,
        replay_capacity=64 if _small() else 1536,
        sample_rows=True,
    )
    sac_cfg = sac.SACConfig()
    env = L2F(EnvConfig())
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    states, env_params, run_cfg = population.population_init(
        jax.random.key(1), env, airframes, pop_cfg, sac_cfg
    )
    warmup = population.make_population_warmup(env, run_cfg)
    super_step = population.make_population_multi_step(
        env, run_cfg, sac_cfg, spc, unroll=True
    )
    for _ in range(pop_cfg.warmup_super_steps):
        states = warmup(states, env_params)
    states, metrics = super_step(states, env_params)
    float(jnp.sum(metrics.critic_loss))  # warm + drain

    env_steps_per_call = (
        K * run_cfg.n_envs * run_cfg.rollout_length * spc
    )

    def timed(iters):
        nonlocal states
        t0 = time.perf_counter()
        m = metrics
        for _ in range(iters):
            states, m = super_step(states, env_params)
        float(jnp.sum(m.critic_loss))  # hard sync (readback)
        return time.perf_counter() - t0

    lo, hi = 2, 6
    t_lo, t_hi = timed(lo), timed(hi)
    return env_steps_per_call * (hi - lo) / max(t_hi - t_lo, 1e-9)


# ------------------------------------------------------------ orchestration


def run_sub(name, timeout_s):
    """Run one metric in its own (sole-TPU) subprocess; None on any failure."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sub", name],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)["value"]
        except (json.JSONDecodeError, KeyError):
            continue
    return None


def main():
    if len(sys.argv) == 3 and sys.argv[1] == "--sub":
        fn = globals()["bench_" + sys.argv[2]]
        print(json.dumps({"value": fn()}))
        return

    detail = {"n_envs": 256 if _small() else N_ENVS,
              "n_steps": 64 if _small() else N_STEPS,
              "small_smoke_mode": _small()}
    for name, timeout_s in SUBBENCHES:
        v = run_sub(name, timeout_s)
        detail[name] = None if v is None else round(v)

    headline = detail["fused_pallas_rollout"]
    closed_loop = detail["fused_policy_eval"]
    print(
        json.dumps(
            {
                "metric": "env-steps/s/chip (vectorized l2f step)",
                "value": headline,
                "unit": "env-steps/s",
                "vs_baseline": (
                    None
                    if headline is None
                    else round(headline / REFERENCE_STEPS_PER_S, 2)
                ),
                "detail": dict(
                    detail,
                    target_10M_closed_loop_met=(
                        bool(closed_loop and closed_loop >= 1e7)
                    ),
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
