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


def _time_marginal(fn, n_lo=1, n_hi=3):
    """Run fn() n_lo times (sync), then n_hi times (sync); return marginal
    seconds per call."""
    fn()  # warm (compile)
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
    p.add_argument("manifest", help="teacher checkpoints.txt")
    p.add_argument("--envs-per-teacher", type=int, default=8)
    p.add_argument("--rollout-length", type=int, default=500)
    p.add_argument("--out", default=None, help="JSON report path")
    args = p.parse_args(argv)

    env = L2F(EnvConfig())
    teacher_actors, airframes = load_teachers(args.manifest)
    K = jax.tree.leaves(airframes)[0].shape[0]
    M = args.envs_per_teacher
    T = args.rollout_length
    n_env_steps = K * M * T
    cfg = post_training.DistillConfig(
        envs_per_teacher=M, rollout_length=T, fused_collect=True
    )
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

    report = {
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
    return report


if __name__ == "__main__":
    main()
