"""Speed-of-light accounting for the hot kernels.

Two measurements, one report:

1. **Useful work per env-step** — XLA cost analysis of the single-env
   `dynamics_step` / `env.step` programs (flops + transcendentals). These
   are the algorithmic costs of what the fused kernels compute per step;
   the Pallas kernels integrate the same RK4 math, so achieved useful
   FLOP/s = bench rate x this count.

2. **Attainable VPU peak on THIS chip** — a Pallas micro-kernel of pure
   fused multiply-adds on a VMEM-resident f32 tile, timed marginally
   between two unroll depths (launch/memory cost cancels; same
   methodology as bench.py). The quad kernels are elementwise/VPU-bound
   (no MXU work in the dynamics), so this is the honest roofline to
   compare against — not the chip's MXU TFLOPs.

Report: utilization = (bench rate x flops/step) / measured VPU peak, plus
the transcendental rate (TPU transcendentals run on a slower special
function path, so high utilization with 13 transcendentals per 2810-flop
step means the kernel is partially transcendental-bound).

Usage:
    python -m raptor_tpu.apps.roofline [--bench artifacts/bench_final.json]
        [--out artifacts/roofline.json] [--skip-peak]

(--skip-peak for CPU-only runs: emits the flop counts and utilization
against a previously measured peak if present in --out.)
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def flop_counts():
    """Algorithmic flops/transcendentals per env-step via XLA cost
    analysis (single env, so no batching distortions)."""
    from raptor_tpu.env import EnvConfig, L2F

    env = L2F(EnvConfig())
    p = env.sample_params(jax.random.key(0))
    es, _ = env.reset(jax.random.key(1), p)
    dyn = (
        jax.jit(env.dynamics_step)
        .lower(p, es.dynamics, jnp.zeros(4), jax.random.key(2))
        .compile()
        .cost_analysis()
    )
    full = (
        jax.jit(env.step).lower(p, es, jnp.zeros(4)).compile().cost_analysis()
    )
    return {
        "dynamics_step_flops": dyn.get("flops"),
        "dynamics_step_transcendentals": dyn.get("transcendentals"),
        "env_step_flops": full.get("flops"),
        "env_step_transcendentals": full.get("transcendentals"),
    }


def measure_vpu_peak(rows: int = 512, reps: int = 200) -> dict:
    """Attainable f32 FMA throughput: one VMEM tile, K back-to-back
    y = y*a + b passes in registers, marginal timing between two depths."""
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref, *, depth):
        y = x_ref[...]
        a, b = 1.000001, 1e-7  # keep y finite over any depth

        def body(_, y):
            return y * a + b

        o_ref[...] = jax.lax.fori_loop(0, depth, body, y)

    def make(depth):
        @jax.jit
        def run(x):
            return pl.pallas_call(
                functools.partial(kernel, depth=depth),
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                in_specs=[pl.BlockSpec((rows, 128), lambda: (0, 0))],
                out_specs=pl.BlockSpec((rows, 128), lambda: (0, 0)),
                interpret=jax.default_backend() != "tpu",
            )(x)

        return run

    x = jnp.ones((rows, 128), jnp.float32)
    lo, hi = 256, 1024
    run_lo, run_hi = make(lo), make(hi)

    def timed(run, n):
        float(jnp.sum(run(x)))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            y = run(x)
        s = float(jnp.sum(y))  # readback sync (tunnel-safe)
        assert s == s
        return time.perf_counter() - t0

    t_lo, t_hi = timed(run_lo, reps), timed(run_hi, reps)
    # marginal: (hi-lo) extra FMA passes over the tile, reps times
    dflops = 2.0 * rows * 128 * (hi - lo) * reps
    dt = t_hi - t_lo
    return {
        "vpu_fma_peak_flops_per_s": dflops / dt if dt > 0 else None,
        "tile": [rows, 128],
        "depths": [lo, hi],
        "reps": reps,
        "t_lo_s": t_lo,
        "t_hi_s": t_hi,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None,
                    help="bench.py JSON line file to pull rates from")
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-peak", action="store_true")
    args = ap.parse_args(argv)

    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # also honors RAPTOR_PLATFORM=cpu

    report = {"backend": jax.default_backend()}
    report.update(flop_counts())

    prior = {}
    if args.out:
        try:
            with open(args.out) as f:
                prior = json.load(f)
        except Exception:
            prior = {}
    if args.skip_peak:
        peak = prior.get("vpu_peak") or {}
    else:
        peak = measure_vpu_peak()
    report["vpu_peak"] = peak

    rates = {}
    if args.bench:
        with open(args.bench) as f:
            b = json.loads(f.readlines()[-1])
        d = b.get("detail", {})
        rates = {
            "fused_pallas_rollout": d.get("fused_pallas_rollout"),
            "fused_policy_eval": d.get("fused_policy_eval"),
            "full_env_step_xla": d.get("full_env_step_xla"),
        }
    report["rates_env_steps_per_s"] = rates

    pk = (peak or {}).get("vpu_fma_peak_flops_per_s")
    if pk and rates.get("fused_pallas_rollout"):
        useful = rates["fused_pallas_rollout"] * report["dynamics_step_flops"]
        report["fused_rollout_useful_flops_per_s"] = useful
        report["fused_rollout_vpu_utilization"] = useful / pk
        report["fused_rollout_transcendentals_per_s"] = (
            rates["fused_pallas_rollout"]
            * report["dynamics_step_transcendentals"]
        )
    if pk and rates.get("full_env_step_xla"):
        useful = rates["full_env_step_xla"] * report["env_step_flops"]
        report["env_step_xla_useful_flops_per_s"] = useful
        report["env_step_xla_vpu_utilization"] = useful / pk

    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
