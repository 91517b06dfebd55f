"""CLI: scaling-efficiency benchmark for the sharded teacher-farm super-step
(VERDICT r2 item 4 / BASELINE north star: >=80% scaling efficiency at N>=2).

Measures WEAK scaling of the population pre-training super-step — the
reference's 1000-process SAC farm (README:207) as one vmapped program
sharded over the 'pop' mesh axis (distill/population.py) — at N = 1, 2, 4,
8 devices: each device carries a fixed teacher slice, so ideal throughput
grows linearly and efficiency = rate_N / (N * rate_1)
(parallel/multihost.scaling_report).

Without real multi-chip hardware the numbers come from a VIRTUAL device
mesh (XLA --xla_force_host_platform_device_count on CPU) and are labeled
as such: they validate the sharding/collective plumbing and the harness,
not ICI bandwidth. The day real chips appear, `--platform tpu` runs the
same harness unchanged on the first N chips of the real mesh (multi-host
pods: launch one process per host with multihost.initialize_distributed()
first; the mesh spans processes automatically).

    python -m raptor_tpu.apps.bench_scaling --out artifacts/bench_scaling.json

Each device count runs in its own subprocess because the device count is
fixed at backend initialization.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _worker(n_devices: int, args) -> dict:
    """Measure the sharded population super-step on an n-device mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from raptor_tpu.distill import population
    from raptor_tpu.env import EnvConfig, L2F
    from raptor_tpu.parallel.mesh import make_mesh
    from raptor_tpu.rl import sac

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    env = L2F(EnvConfig())
    K = args.teachers_per_device * n_devices  # weak scaling
    pop_cfg = population.PopulationConfig(
        n_teachers=K,
        envs_per_teacher=args.envs_per_teacher,
        rollout_length=args.rollout_length,
        gradient_steps=args.gradient_steps,
        batch_size=args.batch_size,
        replay_capacity=args.replay_capacity,
        warmup_super_steps=1,
    )
    sac_cfg = sac.SACConfig(actor_hidden=(64, 64), critic_hidden=(64, 64))
    airframes = population.sample_teacher_airframes(jax.random.key(0), K)
    states, env_params, run_cfg = population.population_init(
        jax.random.key(1), env, airframes, pop_cfg, sac_cfg
    )
    mesh = make_mesh(n_devices, ("pop",))
    pop_shard = NamedSharding(mesh, P("pop"))
    states = jax.tree.map(
        lambda x: jax.device_put(x, pop_shard)
        if getattr(x, "ndim", 0) >= 1
        else x,
        states,
    )
    env_params = jax.tree.map(lambda x: jax.device_put(x, pop_shard),
                              env_params)
    warmup = population.make_population_warmup(env, run_cfg)
    super_step = population.make_population_super_step(env, run_cfg, sac_cfg)
    states = warmup(states, env_params)
    states, metrics = super_step(states, env_params)  # warm/compile
    float(jnp.sum(metrics.critic_loss))  # hard sync (NOTES.md readback rule)

    def timed(iters):
        nonlocal states
        t0 = time.perf_counter()
        for _ in range(iters):
            states, metrics = super_step(states, env_params)
        float(jnp.sum(metrics.critic_loss))
        return time.perf_counter() - t0

    lo, hi = args.iters_lo, args.iters_hi
    t_lo, t_hi = timed(lo), timed(hi)
    per_call = (t_hi - t_lo) / (hi - lo)
    env_steps_per_call = K * args.envs_per_teacher * args.rollout_length
    return {
        "devices": n_devices,
        "teachers": K,
        "platform": jax.devices()[0].platform,
        "env_steps_per_call": env_steps_per_call,
        "seconds_per_super_step": per_call,
        "env_steps_per_s": env_steps_per_call / max(per_call, 1e-9),
        # a virtual CPU "device" is a host thread pool slice: once
        # devices exceed physical cores the devices time-share cores and
        # weak scaling MUST flatten/regress (measured round 4: 4-core
        # host, N=8 throughput < N=4). Real accelerator meshes have one
        # chip per device and are immune.
        "host_cpu_count": os.cpu_count(),
        "oversubscribed": (
            jax.devices()[0].platform == "cpu"
            and n_devices > (os.cpu_count() or 1)
        ),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8",
                   help="comma-separated device counts to sweep")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                   help="cpu = virtual device mesh (plumbing validation); "
                        "tpu = first N chips of the real mesh")
    p.add_argument("--teachers-per-device", type=int, default=8)
    p.add_argument("--envs-per-teacher", type=int, default=8)
    p.add_argument("--rollout-length", type=int, default=8)
    p.add_argument("--gradient-steps", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--replay-capacity", type=int, default=256)
    p.add_argument("--iters-lo", type=int, default=4)
    p.add_argument("--iters-hi", type=int, default=16)
    p.add_argument("--timeout", type=int, default=900,
                   help="per-device-count subprocess timeout (s)")
    p.add_argument("--out", default=None, help="JSON report path")
    p.add_argument("--worker", type=int, default=0, help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.worker:
        if args.platform == "tpu":
            from raptor_tpu.utils.cache import enable_persistent_cache

            enable_persistent_cache()
        print(json.dumps(_worker(args.worker, args)))
        return None

    rows = []
    for n in [int(x) for x in args.devices.split(",")]:
        env = dict(os.environ)
        cmd = [sys.executable, "-m", "raptor_tpu.apps.bench_scaling",
               "--worker", str(n), "--platform", args.platform]
        for flag in ("teachers_per_device", "envs_per_teacher",
                     "rollout_length", "gradient_steps", "batch_size",
                     "replay_capacity", "iters_lo", "iters_hi"):
            cmd += ["--" + flag.replace("_", "-"),
                    str(getattr(args, flag))]
        if args.platform == "cpu":
            # total CPU isolation (NOTES.md 5b) + virtual device mesh
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["RAPTOR_PLATFORM"] = "cpu"
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout,
                env=env,
            )
        except subprocess.TimeoutExpired:
            rows.append({"devices": n, "error": "timeout"})
            continue
        if proc.returncode != 0:
            rows.append({"devices": n,
                         "error": proc.stderr.strip()[-500:]})
            continue
        rows.append(json.loads(proc.stdout.strip().splitlines()[-1]))

    from raptor_tpu.parallel.multihost import scaling_report

    ok = [r for r in rows if "env_steps_per_s" in r]
    base = next((r for r in ok if r["devices"] == 1), None)
    reports = [
        scaling_report(base["env_steps_per_s"], r["env_steps_per_s"],
                       r["devices"])
        for r in ok
        if base is not None
    ]
    out = {
        "workload": "population pre-training super-step (weak scaling, "
                    f"{args.teachers_per_device} teachers/device)",
        "platform": args.platform,
        "virtual_mesh": args.platform == "cpu",
        "host_cpu_count": os.cpu_count(),
        "note": (
            "CPU virtual-device mesh: validates sharding/collective "
            "plumbing and the measurement harness, NOT ICI bandwidth — "
            "the >=80% north-star number requires real chips "
            "(--platform tpu on a multi-chip host). Rows with "
            "oversubscribed=true have more virtual devices than physical "
            "cores: the devices time-share cores, so weak scaling "
            "flattens or regresses there by construction — those rows "
            "validate plumbing only and are excluded from the efficiency "
            "verdict."
            if args.platform == "cpu"
            else "real device mesh"
        ),
        "rows": rows,
        "scaling": reports,
        "scaling_valid": [
            r for r, row in zip(reports, ok)
            if base is not None and not row.get("oversubscribed")
        ],
    }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
