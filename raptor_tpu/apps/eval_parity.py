"""CLI: measure the eval-parity initial-state distribution (VERDICT r1 #3).

The reference's shipped post-training log ends at eval episode length
482.8/500 with 4.2% termination (aggregate) and 477.4/500 / 5.0% on the
held-out crazyflie (BASELINE.md rows 21-27).  Our default `InitConfig`
samples initial attitude uniformly up to max_angle=pi, which makes ~half of
the episodes unrecoverable for ANY policy (NOTES.md round-1 table) — so the
two eval protocols are not comparable.

This tool pins the protocol down empirically: it sweeps `max_angle` and
evaluates the SHIPPED reference policy (the ground-truth artifact) on our
simulator, reporting episode length / termination share per angle.  The
angle at which the shipped policy reproduces its own logged eval stats
(~480/500, ~4-5%) defines the eval-parity `InitConfig`; that setting is
committed as `env.types.eval_parity_init()` and used for all
ours-vs-reference comparisons.

    RAPTOR_PLATFORM=cpu python -m raptor_tpu.apps.eval_parity
    ... --checkpoint artifacts/student_128teachers.h5   # also score a student
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, L2F, presets, sample_population
from raptor_tpu.env.types import InitConfig
from raptor_tpu.rl import evaluation


@functools.lru_cache(maxsize=None)
def _eval_program(angle: float, m: int):
    """Jitted eval with the policy params as a traced ARGUMENT.

    Baking params as closure constants (the pre-round-5 shape) makes the
    XLA program hash depend on the weights, so every new student re-pays
    ~18 remote axon compiles (~90 s each = the old 27-min eval sweep).
    With params as an input there are only 9 per-angle programs, compiled
    once and persistent-cached for every later student (NOTES.md round-5).
    One program serves both the shipped reference and any student because
    the checkpoint pytrees share shapes.
    """
    cfg = EnvConfig(init=InitConfig(max_angle=angle))
    env = L2F(cfg)
    from raptor_tpu.policy import network as policy_net

    @jax.jit
    def run(policy_params, stacked, key):
        def policy_step(h, obs):
            return policy_net.apply_step(policy_params, h, obs[..., :22])

        carry = policy_net.initial_hidden(policy_params, m)
        return evaluation.evaluate(env, stacked, policy_step, carry, key, m)

    return run


def evaluate_at_angle(
    policy_params,
    angle: float,
    key: jax.Array,
    n_airframes: int,
    envs_per: int,
    airframe: str = "random",
):
    """5-stat eval of a recurrent policy with initial attitude <= angle."""
    m = n_airframes * envs_per
    if airframe == "random":
        frames = sample_population(jax.random.fold_in(key, 7), n_airframes)
        stacked = jax.tree.map(lambda x: jnp.repeat(x, envs_per, axis=0), frames)
    else:
        one = getattr(presets, airframe)()
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (m,) + x.shape), one
        )
    return _eval_program(angle, m)(policy_params, stacked, key)


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="additionally score this student .h5 at each angle")
    p.add_argument("--angles", default="0.2,0.4,0.6,0.8,1.0,1.2,1.5,2.0,3.14159",
                   help="comma-separated max_angle sweep (rad)")
    p.add_argument("--n-airframes", type=int, default=32)
    p.add_argument("--envs-per-airframe", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="write JSON report here")
    args = p.parse_args(argv)

    from raptor_tpu.policy import shipped_checkpoint_path

    shipped = ckpt_h5.load_actor(shipped_checkpoint_path())
    student = ckpt_h5.load_actor(args.checkpoint) if args.checkpoint else None

    angles = [float(a) for a in args.angles.split(",")]
    key = jax.random.key(args.seed)
    report = {"reference_targets": {
        "aggregate": {"episode_length": 482.8, "share_terminated": 0.042},
        "crazyflie": {"episode_length": 477.4, "share_terminated": 0.050},
    }, "sweep": []}

    header = (f"{'angle':>7} | {'cf len':>7} {'cf term':>8} {'cf ret':>8} | "
              f"{'agg len':>7} {'agg term':>8} {'agg ret':>8}")
    print("shipped reference policy on our simulator:")
    print(header)
    print("-" * len(header))
    for a in angles:
        cf = evaluate_at_angle(shipped, a, jax.random.fold_in(key, 1),
                               args.n_airframes, args.envs_per_airframe,
                               "crazyflie")
        ag = evaluate_at_angle(shipped, a, jax.random.fold_in(key, 2),
                               args.n_airframes, args.envs_per_airframe,
                               "random")
        row = {
            "max_angle": a,
            "crazyflie": {
                "episode_length": float(cf.episode_length_mean),
                "share_terminated": float(cf.share_terminated),
                "return": float(cf.return_mean),
            },
            "aggregate": {
                "episode_length": float(ag.episode_length_mean),
                "share_terminated": float(ag.share_terminated),
                "return": float(ag.return_mean),
            },
        }
        if student is not None:
            scf = evaluate_at_angle(student, a, jax.random.fold_in(key, 3),
                                    args.n_airframes, args.envs_per_airframe,
                                    "crazyflie")
            sag = evaluate_at_angle(student, a, jax.random.fold_in(key, 4),
                                    args.n_airframes, args.envs_per_airframe,
                                    "random")
            row["student_crazyflie"] = {
                "episode_length": float(scf.episode_length_mean),
                "share_terminated": float(scf.share_terminated),
                "return": float(scf.return_mean),
            }
            row["student_aggregate"] = {
                "episode_length": float(sag.episode_length_mean),
                "share_terminated": float(sag.share_terminated),
                "return": float(sag.return_mean),
            }
        report["sweep"].append(row)
        print(f"{a:7.3f} | {row['crazyflie']['episode_length']:7.1f} "
              f"{row['crazyflie']['share_terminated']:8.3f} "
              f"{row['crazyflie']['return']:8.1f} | "
              f"{row['aggregate']['episode_length']:7.1f} "
              f"{row['aggregate']['share_terminated']:8.3f} "
              f"{row['aggregate']['return']:8.1f}")
        if student is not None:
            print(f"{'stud.':>7} | {row['student_crazyflie']['episode_length']:7.1f} "
                  f"{row['student_crazyflie']['share_terminated']:8.3f} "
                  f"{row['student_crazyflie']['return']:8.1f} | "
                  f"{row['student_aggregate']['episode_length']:7.1f} "
                  f"{row['student_aggregate']['share_terminated']:8.3f} "
                  f"{row['student_aggregate']['return']:8.1f}")

    # pick the largest angle at which the shipped policy's AGGREGATE stats
    # still match its own logged final eval (482.8/500 length, 4.2%
    # terminated — BASELINE.md): length >= 480 and termination <= 5.5%.
    # Measured result (artifacts/eval_parity_sweep.json): max_angle = 1.0,
    # where the match is near-exact (482.9/500, 4.3%).
    best = None
    for row in report["sweep"]:
        ag = row["aggregate"]
        if ag["episode_length"] >= 480.0 and ag["share_terminated"] <= 0.055:
            if best is None or row["max_angle"] > best:
                best = row["max_angle"]  # largest match, any sweep order
    report["eval_parity_max_angle"] = best
    print(f"\neval-parity max_angle (largest matching reference envelope): {best}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report: {args.out}")
    return report


if __name__ == "__main__":
    main()
