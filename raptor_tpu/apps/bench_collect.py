"""CLI: benchmark the fused DAgger-collect kernel vs the XLA collect path
(VERDICT r1 item 4 acceptance: >=10x collect throughput at K=128 x 8 envs).

Marginal-cost methodology per NOTES.md: device->host readback as the sync
(block_until_ready can return early through the axon tunnel), timing the
difference between two iteration counts so compile/dispatch constants cancel.

    python -m raptor_tpu.apps.bench_collect <checkpoints.txt> --envs-per-teacher 8
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _sync(x) -> float:
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def _time_marginal(fn, n_lo=2, n_hi=8):
    """Run fn() n_lo times (sync), then n_hi times (sync); return marginal
    seconds per call."""
    out = fn()  # warm (compile)
    _sync(out[0] if isinstance(out, tuple) else out)  # drain the warm-up
    t0 = time.perf_counter()
    for _ in range(n_lo):
        out = fn()
    _sync(out[0] if isinstance(out, tuple) else out)
    t1 = time.perf_counter()
    for _ in range(n_hi):
        out = fn()
    _sync(out[0] if isinstance(out, tuple) else out)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo)


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from raptor_tpu.apps.post_training import load_teachers
    from raptor_tpu.distill import post_training
    from raptor_tpu.env import EnvConfig, L2F
    from raptor_tpu.policy import network as student_net

    p = argparse.ArgumentParser()
    p.add_argument("manifest", nargs="?", default=None,
                   help="teacher checkpoints.txt (omit with --synthetic)")
    p.add_argument("--synthetic", type=int, default=None, metavar="K",
                   help="benchmark with K randomly initialized teachers + "
                        "sampled airframes instead of a checkpoint manifest "
                        "(throughput/parity are weight-independent; lets the "
                        "bench run when trained checkpoints are absent)")
    p.add_argument("--envs-per-teacher", type=int, default=8)
    p.add_argument("--rollout-length", type=int, default=500)
    p.add_argument("--out", default=None, help="JSON report path")
    args = p.parse_args(argv)

    env = L2F(EnvConfig())
    if args.synthetic is not None and args.synthetic <= 0:
        p.error(f"--synthetic needs a positive teacher count, got "
                f"{args.synthetic}")
    if args.synthetic:
        from raptor_tpu.distill.population import sample_teacher_airframes
        from raptor_tpu.rl import networks

        airframes = sample_teacher_airframes(jax.random.key(7),
                                             args.synthetic)
        teacher_actors = jax.vmap(
            lambda k: networks.actor_init(k, env.OBSERVATION_DIM, 4)
        )(jax.random.split(jax.random.key(8), args.synthetic))
    elif args.manifest:
        teacher_actors, airframes = load_teachers(args.manifest)
    else:
        p.error("provide a manifest or --synthetic K")
    K = jax.tree.leaves(airframes)[0].shape[0]
    M = args.envs_per_teacher
    T = args.rollout_length
    n_env_steps = K * M * T
    cfg = post_training.DistillConfig(envs_per_teacher=M, rollout_length=T)
    from raptor_tpu.distill.population import broadcast_airframe_to_envs

    env_params = broadcast_airframe_to_envs(airframes, M)
    student = student_net.init_params(jax.random.key(0))
    key = jax.random.key(1)

    # --- XLA path (beta=0: student-driven, teachers label in-loop)
    collect = post_training.make_collect(env, cfg)
    xla_s = _time_marginal(
        lambda: collect(student, teacher_actors, env_params, key, 0.0).obs
    )
    xla_rate = n_env_steps / xla_s

    # --- fused path (Pallas rollout kernel + batched relabel)
    relabel = post_training.make_relabel(env)

    def fused():
        data = post_training.fused_collect_round(
            student, teacher_actors, env_params, key, env, cfg, relabel, 0
        )
        return data.teacher_action

    fused_s = _time_marginal(fused)
    fused_rate = n_env_steps / fused_s

    # compiled-kernel parity spot-check (the pytest suite runs the kernel in
    # interpret mode only — this is the real-TPU check). Gate on ONE full
    # closed-loop step (obs -> GRU -> action -> RK4 -> obs) from 1024 random
    # states: no feedback amplification, so any real lowering bug shows as
    # raw op-level error. The LONG-trajectory XLA-vs-kernel difference is
    # reported informationally only — under a random (untrained) policy the
    # quad tumbles chaotically and two correct f32 implementations with
    # different rounding diverge exponentially (measured 0.27 after 100
    # steps on TPU while interpret mode, which runs identical float ops,
    # matches to 1e-5).
    from raptor_tpu.env.types import InitConfig, TerminationConfig
    from raptor_tpu.ops.pallas_collect import make_fused_collect

    pc_cfg = EnvConfig(
        init=InitConfig(max_angle=0.2, linear_velocity_std=0.02,
                        angular_velocity_std=0.02),
        termination=TerminationConfig(position_bound=50.0,
                                      angular_velocity_bound=1000.0),
    )
    pc_env = L2F(pc_cfg)
    n_pc = 1024
    base = max(1, min(K, n_pc))
    reps = -(-n_pc // base)  # ceil: exact n_pc rows for ANY teacher count
    pc_params = jax.tree.map(
        lambda x: jnp.repeat(x[:base], reps, axis=0)[:n_pc], airframes
    )
    es, obs0 = jax.jit(jax.vmap(pc_env.reset, in_axes=(0, 0)))(
        jax.random.split(jax.random.key(9), n_pc), pc_params
    )
    T_pc = 100
    obs_f, reset_f = make_fused_collect(student, T_pc, pc_cfg)(
        pc_params, es.dynamics, 3
    )
    _, v_step = pc_env.vector_ops()
    h0 = student_net.initial_hidden(student, n_pc)

    def body(carry, _):
        es, obs, h = carry
        h2, a = student_net.apply_step(student, h, obs[..., :22])
        es2, obs2, _, done, _ = v_step(pc_params, es, jnp.clip(a, -1, 1))
        return (es2, obs2, h2), obs[..., :22]

    # The reference must run at HIGHEST matmul precision: the kernel's GRU
    # streams exact f32 scalar FMAs, while XLA's default TPU precision
    # rounds matmul inputs to bf16 (~1e-3 relative) — at default precision
    # the gate measures XLA's rounding, not the kernel's error (probe
    # artifacts/collect_parity_probe.json attributed the old 4.3e-4 step-1
    # "failure" to the prev_action/GRU channels).
    with jax.default_matmul_precision("highest"):
        _, obs_x = jax.jit(
            lambda es, obs0, h0: jax.lax.scan(body, (es, obs0, h0), None,
                                              length=T_pc)
        )(es, obs0, h0)
    # row t is the pre-step obs of step t: row 1 is the state after exactly
    # one closed-loop step -> the gated single-step parity
    step1_err = float(jnp.max(jnp.abs(obs_f[1] - obs_x[1])))
    drift_err = float(jnp.max(jnp.abs(obs_f - obs_x)))
    # only a reset in the first two rows could contaminate the gated step-1
    # comparison; later chaotic-trajectory resets are expected and harmless
    parity_resets = float(jnp.sum(reset_f[:2]))

    report = {
        "parity_step1_err": step1_err,
        "trajectory_drift_100steps": drift_err,
        "parity_resets_first2": parity_resets,
        "parity_ok": bool(step1_err < 1e-4 and parity_resets == 0.0),
        "teachers": K,
        "envs_per_teacher": M,
        "rollout_length": T,
        "env_steps_per_round": n_env_steps,
        "xla_collect_s": xla_s,
        "xla_collect_steps_per_s": xla_rate,
        "fused_collect_s": fused_s,
        "fused_collect_steps_per_s": fused_rate,
        "speedup": fused_rate / xla_rate,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    if not report["parity_ok"]:
        raise SystemExit(2)  # the kernel showcase must match the XLA path
    return report


if __name__ == "__main__":
    main()
