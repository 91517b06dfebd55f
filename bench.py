"""North-star benchmark: vectorized l2f env stepping throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric (BASELINE.json): env-steps/s/chip for the vectorized dynamics step —
the full env.step (RK4 dynamics + obs-free reward/termination + auto-reset)
over N domain-randomized airframes, `lax.scan` over T steps under one jit.
vs_baseline is the ratio to the reference pipeline's measured 10,580
env-steps/s (post-training incl. training, SURVEY §6.2 — the only measured
reference throughput; the driver-set target is >10M steps/s/chip).
"""

import json
import os
import time

import jax

# the axon TPU compile path is remote-RPC-bound (minutes for the fused env
# graph); the persistent cache makes every run after the first instant.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from raptor_tpu.env import EnvConfig, L2F, sample_population

REFERENCE_STEPS_PER_S = 10_580.0


def build_bench(env: L2F, n_envs: int, n_steps: int):
    v_reset, v_step = env.vector_ops()

    @jax.jit
    def rollout(params, es):
        def body(carry, _):
            es = carry
            # constant mid-range action: keeps the full control path hot
            # without a policy in the loop (pure env-engine metric)
            action = jnp.zeros((n_envs, 4), jnp.float32)
            es, obs, r, d, _ = env_step(params, es, action)
            return es, (jnp.sum(r), jnp.sum(d))

        env_step = v_step
        es, (rs, ds) = jax.lax.scan(body, es, None, length=n_steps)
        return es, jnp.sum(rs), jnp.sum(ds)

    return v_reset, rollout


def main():
    n_envs = 16384
    n_steps = 512
    env = L2F(EnvConfig())

    key = jax.random.key(0)
    kp, kr = jax.random.split(key)
    params = sample_population(kp, n_envs)
    v_reset, rollout = build_bench(env, n_envs, n_steps)
    es, _ = v_reset(jax.random.split(kr, n_envs), params)

    # compile + warmup
    es_w, r, d = rollout(params, es)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        es, r, d = rollout(params, es)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps_per_s = n_envs * n_steps * iters / dt
    print(
        json.dumps(
            {
                "metric": "env-steps/s/chip (vectorized l2f step)",
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
