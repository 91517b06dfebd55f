"""Worker for the true multi-process `jax.distributed` test (SURVEY §5.3
"simulated N-process" meshes; VERDICT r3 missing #4).

Launched as N subprocesses by tests/test_distributed_multiprocess.py, each
with 8//N virtual CPU devices, joined through a local coordinator with gloo
cross-process collectives. Exercises exactly the multihost surface that had
only ever run single-process:

  - `initialize_distributed(addr, N, rank)` with a real coordinator
  - per-host RNG divergence via `host_key`
  - `make_global_array` assembling a population axis from per-host shards
  - one jitted population SAC super-step over the global 'pop' mesh

Writes a JSON report (checksums, process counts, host-key draws) for the
parent test to compare across ranks and against the single-process run.
Not collected by pytest (no test_ prefix).
"""

import argparse
import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rank", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from raptor_tpu.parallel.multihost import (
        host_key,
        initialize_distributed,
        make_global_array,
    )

    initialize_distributed(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.rank,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from raptor_tpu.distill import population
    from raptor_tpu.env import EnvConfig, L2F
    from raptor_tpu.rl import sac

    n_global = jax.device_count()
    assert n_global == 8, n_global
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("pop",))

    # --- per-host RNG discipline: independent streams per process ---
    hk_draw = float(jax.random.normal(host_key(jax.random.key(7))))

    # --- global population from per-host shards ---
    K = 8
    env = L2F(EnvConfig())
    pop_cfg = population.PopulationConfig(
        n_teachers=K, envs_per_teacher=4, rollout_length=4,
        gradient_steps=2, batch_size=16, replay_capacity=64,
        warmup_super_steps=1,
    )
    sac_cfg = sac.SACConfig()

    # every process computes the same full population deterministically,
    # then contributes only ITS rows through make_global_array — the real
    # multi-host handoff (on a pod each host would sample only its slice)
    full_airframes = jax.tree.map(
        np.asarray,
        population.sample_teacher_airframes(jax.random.key(3), K),
    )
    per = K // args.num_processes
    lo, hi = args.rank * per, (args.rank + 1) * per
    airframes_g = jax.tree.map(
        lambda x: make_global_array(x[lo:hi], mesh, P("pop")),
        full_airframes,
    )

    # --- init + warmup + jitted super-steps over the global mesh ---
    def init_states(af):
        states, env_params, _ = population.population_init(
            jax.random.key(4), env, af, pop_cfg, sac_cfg
        )
        return states, env_params

    states, env_params = jax.jit(init_states)(airframes_g)
    # run_cfg is pure Python — rebuild it statically
    from raptor_tpu.rl import runner as runner_mod
    run_cfg = runner_mod.RunnerConfig(
        n_envs=pop_cfg.envs_per_teacher,
        rollout_length=pop_cfg.rollout_length,
        gradient_steps=pop_cfg.gradient_steps,
        batch_size=pop_cfg.batch_size,
        replay_capacity=pop_cfg.replay_capacity,
    )

    warmup = population.make_population_warmup(env, run_cfg)
    states = warmup(states, env_params)
    step = population.make_population_super_step(env, run_cfg, sac_cfg)
    for _ in range(3):
        states, metrics = step(states, env_params)

    # --- replicated global checksums (fully-replicated scalars are
    # readable on every process) ---
    def checksum(states):
        leaves = jax.tree.leaves(states.sac.actor) + jax.tree.leaves(
            states.sac.critic
        )
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float64)) for x in leaves)

    cks = float(
        jax.jit(checksum, out_shardings=NamedSharding(mesh, P()))(states)
    )
    critic_loss = float(
        jax.jit(
            lambda m: jnp.mean(m), out_shardings=NamedSharding(mesh, P())
        )(metrics.critic_loss)
    )

    report = {
        "rank": args.rank,
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": n_global,
        "host_key_draw": hk_draw,
        "checksum": cks,
        "critic_loss": critic_loss,
    }
    with open(args.out, "w") as f:
        json.dump(report, f)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
