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
    analysis (single env, so no batching distortions).

    Two dynamics counts are reported: the DETERMINISTIC step (key=None) is
    the honest useful-work count for the fused rollout kernel, which
    integrates the same RK4 math but replaces threefry+Box-Muller
    disturbance sampling with nothing (constant action, no disturbances).
    The keyed count is ~2x larger (2810 vs 1352 flops) purely from RNG —
    using it inflated the kernel's apparent utilization to 5.4x peak."""
    from raptor_tpu.env import EnvConfig, L2F

    env = L2F(EnvConfig())
    p = env.sample_params(jax.random.key(0))
    es, _ = env.reset(jax.random.key(1), p)
    dyn_det = (
        jax.jit(lambda p, s, a: env.dynamics_step(p, s, a, None))
        .lower(p, es.dynamics, jnp.zeros(4))
        .compile()
        .cost_analysis()
    )
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
        "dynamics_step_flops_deterministic": dyn_det.get("flops"),
        "dynamics_step_transcendentals_deterministic": dyn_det.get(
            "transcendentals"
        ),
        "dynamics_step_flops": dyn.get("flops"),
        "dynamics_step_transcendentals": dyn.get("transcendentals"),
        "env_step_flops": full.get("flops"),
        "env_step_transcendentals": full.get("transcendentals"),
    }


def measure_vpu_peak(rows: int = 256, nfma: int = 32, reps: int = 4) -> dict:
    """Attainable f32 FMA throughput: a VMEM-resident (rows,128) value with
    `nfma` chained y = y*a + b passes per fori_loop iteration, marginal
    timing between two loop depths.

    Sizing was calibrated empirically on the v5e chip (all failure modes
    were observed before landing here):
    - Depths must put ~10+ ms of FMA work in ONE kernel call: through the
      axon tunnel each dispatch costs ~0.4 ms, which at shallow depths
      swamped the marginal signal (t_hi < t_lo with depth 256/1024).
    - One FMA per loop iteration measures fori_loop/VMEM-roundtrip
      overhead, not the ALUs (~1.7 TF/s). Throughput climbs with FMAs per
      iteration and saturates ~4.5 TF/s at nfma>=16 on a (256,128) tile
      (measured: nfma 1/2/4/8/16/32 -> 1.6/3.4/3.9/4.2/4.4/4.55 TF/s;
      independent-accumulator variants plateau at the same ceiling).
    The saturated figure is the honest roofline for the elementwise-RK4
    kernels: at it, the fused rollout's useful-flop rate is ~80-97% of
    peak depending on which flop count is used (hand count ~1.1k vs XLA's
    deterministic 1352/step)."""
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref, *, depth):
        y = x_ref[...]
        a, b = 1.000001, 1e-7  # keep y finite over any depth

        def body(_, y):
            for _ in range(nfma):
                y = y * a + b
            return y

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
    lo, hi = 1 << 16, 3 << 16
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
    # marginal: (hi-lo)*nfma extra FMA passes over the tile, reps times
    dflops = 2.0 * nfma * rows * 128 * (hi - lo) * reps
    dt = t_hi - t_lo
    return {
        "vpu_fma_peak_flops_per_s": dflops / dt if dt > 0 else None,
        "tile": [rows, 128],
        "fma_per_iteration": nfma,
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
        # deterministic count: the kernel does no threefry/Box-Muller
        useful = (
            rates["fused_pallas_rollout"]
            * report["dynamics_step_flops_deterministic"]
        )
        report["fused_rollout_useful_flops_per_s"] = useful
        report["fused_rollout_vpu_utilization"] = useful / pk
        if report["fused_rollout_vpu_utilization"] > 1.0:
            report["peak_warning"] = (
                "utilization > 1: the measured peak is an underestimate "
                "(dispatch noise or VMEM spill) — re-measure before citing"
            )
        report["fused_rollout_transcendentals_per_s"] = (
            rates["fused_pallas_rollout"]
            * report["dynamics_step_transcendentals_deterministic"]
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
