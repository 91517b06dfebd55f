"""North-star benchmark: vectorized l2f env stepping throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Metric (BASELINE.json): env-steps/s/chip for the vectorized l2f dynamics
step. Two paths are measured:
- fused:    the Pallas fused-rollout kernel (ops/pallas_rollout.py) — the
            entire T-step RK4 rollout in VMEM, SoA layout (headline value);
- env_step: the full XLA env.step (dynamics + reward + termination +
            auto-reset) under lax.scan — the end-to-end semantic path.

vs_baseline is the ratio to the reference pipeline's measured 10,580
env-steps/s (SURVEY §6.2 — the only measured reference throughput; the
driver-set target is >10M steps/s/chip).
"""

import json
import os
import time

import jax

# the axon TPU compile path is remote-RPC-bound (minutes for big fused XLA
# graphs); the persistent cache makes every run after the first instant.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

REFERENCE_STEPS_PER_S = 10_580.0
N_ENVS = 16384
N_STEPS = 512


def bench_fused(params, state):
    from raptor_tpu.env import dynamics
    from raptor_tpu.ops import pallas_rollout as pr

    pp = pr.pack_params(params)
    sp = pr.pack_state(state)
    ha = jax.vmap(dynamics.hover_action)(params)
    ap = pr.pack_action(jnp.tile(ha[:, None], (1, 4)))
    out, _ = pr.fused_rollout_packed(pp, sp, ap, N_STEPS)
    float(jnp.sum(out[2]))  # warm + drain the queue

    # block_until_ready is unreliable through the axon tunnel (can return
    # before execution); a device->host readback is a hard sync. Fixed
    # per-batch overhead (tunnel RTT) cancels in the marginal cost between
    # two iteration counts.
    def timed(iters):
        t0 = time.perf_counter()
        o = sp
        for _ in range(iters):
            o, _ = pr.fused_rollout_packed(pp, o, ap, N_STEPS)
        float(jnp.sum(o[2]))  # hard sync
        return time.perf_counter() - t0

    lo, hi = 10, 40
    t_lo, t_hi = timed(lo), timed(hi)
    return N_ENVS * N_STEPS * (hi - lo) / max(t_hi - t_lo, 1e-9)


def bench_env_step(env, params, es):
    _, v_step = env.vector_ops()

    @jax.jit
    def rollout(params, es):
        def body(es, _):
            es, obs, r, d, _ = v_step(params, es, jnp.zeros((N_ENVS, 4)))
            return es, (jnp.sum(r), jnp.sum(d))

        es, (rs, ds) = jax.lax.scan(body, es, None, length=N_STEPS)
        return es, jnp.sum(rs), jnp.sum(ds)

    es, r, d = rollout(params, es)
    jax.block_until_ready(r)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        es, r, d = rollout(params, es)
    jax.block_until_ready(r)
    return N_ENVS * N_STEPS * iters / (time.perf_counter() - t0)


def main():
    from raptor_tpu.env import EnvConfig, L2F, sample_population

    env = L2F(EnvConfig())
    key = jax.random.key(0)
    kp, kr = jax.random.split(key)
    params = sample_population(kp, N_ENVS)
    v_reset, _ = env.vector_ops()
    es, _ = jax.jit(v_reset)(jax.random.split(kr, N_ENVS), params)

    fused = bench_fused(params, es.dynamics)
    detail = {
        "fused_pallas_rollout": round(fused),
        "n_envs": N_ENVS,
        "n_steps": N_STEPS,
    }
    # the XLA full-step program can take >10 min to compile through the
    # axon remote-compile tunnel on a cold cache; opt-in to keep the
    # default bench fast and reliable (measured 119M steps/s warm).
    if os.environ.get("RAPTOR_BENCH_FULL") == "1":
        detail["full_env_step_xla"] = round(bench_env_step(env, params, es))

    print(
        json.dumps(
            {
                "metric": "env-steps/s/chip (vectorized l2f step)",
                "value": round(fused),
                "unit": "env-steps/s",
                "vs_baseline": round(fused / REFERENCE_STEPS_PER_S, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
