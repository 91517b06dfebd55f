"""CLI: distillation post-training — the reference
`foundation_policy_post_training` (README:208).

Reads a teacher-checkpoint manifest (the `checkpoints.txt` emitted by
pre_training, mirroring `extract_checkpoints.sh`'s `checkpoints_*.txt`,
README:213-215), distills the GRU student across the teacher population,
logs the reference's tfevents tags (`loss`, `evaluation/*`, `crazyflie/*`),
and exports the student in the reference h5 schema with golden example I/O.

    python -m raptor_tpu.apps.post_training experiments/<...>/checkpoints.txt --rounds 40
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.distill import post_training
from raptor_tpu.env import EnvConfig, L2F, presets
from raptor_tpu.env.io import load_params_json
from raptor_tpu.env.types import eval_parity_init
from raptor_tpu.rl import evaluation
from raptor_tpu.utils.extrack import Run


def load_teachers(manifest_path: str):
    """Load a teacher population from any of:

    - a `.npz` teacher pack (apps.pack_teachers),
    - a `checkpoints.txt` manifest of per-teacher h5 paths (the
      pre_training output, mirroring the reference's `checkpoints_*.txt`,
      README:213-215),
    - a manifest whose lines are themselves `.npz` packs (or a mix of
      packs and h5 paths) — populations from several waves concatenate
      along the K axis, so a reference-scale distillation can run purely
      from committed packs after the build machine is reimaged.
    """
    from raptor_tpu.apps.pack_teachers import load_teacher_pack

    if manifest_path.endswith(".npz"):  # committed teacher pack
        return load_teacher_pack(manifest_path)
    with open(manifest_path) as f:
        paths = [line.strip() for line in f if line.strip()]
    if not paths:
        raise ValueError(
            f"teacher manifest {manifest_path!r} is empty — it must list "
            ".h5 checkpoints and/or .npz teacher packs, one per line"
        )
    # groups are built per manifest line (consecutive h5 runs stack into one
    # group) so the K-axis teacher order matches the manifest line order.
    groups = []  # list of (stacked-[k] actors, stacked-[k] airframes)
    h5_run = []

    def flush_h5():
        if not h5_run:
            return
        actors = [ckpt_h5.load_mlp_actor(p) for p in h5_run]
        frames = [
            load_params_json(p.replace(".h5", "_dynamics.json"))
            for p in h5_run
        ]
        groups.append(
            (
                jax.tree.map(lambda *xs: jnp.stack(xs), *actors),
                jax.tree.map(lambda *xs: jnp.stack(xs), *frames),
            )
        )
        h5_run.clear()

    for p in paths:
        if p.endswith(".npz"):
            flush_h5()
            groups.append(load_teacher_pack(p))
        else:
            h5_run.append(p)
    flush_h5()
    if len(groups) == 1:
        return groups[0]
    a = jax.tree.map(lambda *xs: jnp.concatenate(xs), *[g[0] for g in groups])
    f = jax.tree.map(lambda *xs: jnp.concatenate(xs), *[g[1] for g in groups])
    return a, f


def evaluate_student(env, student, airframes, key, n_envs_per=8, episode_length=None):
    """Aggregate 5-stat eval of the recurrent student across airframes."""
    k_shape = jax.tree.leaves(airframes)[0].shape[0]
    params = jax.tree.map(
        lambda x: jnp.repeat(x, n_envs_per, axis=0), airframes
    )
    m = k_shape * n_envs_per
    step_fn, carry = evaluation.gru_policy_step(student, m)
    return evaluation.evaluate(
        env, params, step_fn, carry, key, m, episode_length
    )


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("manifest", help="teacher checkpoints.txt")
    p.add_argument("--rounds", type=int, default=40)
    p.add_argument("--envs-per-teacher", type=int, default=8)
    p.add_argument("--epochs-per-round", type=int, default=2)
    p.add_argument("--teacher-mix-initial", type=float, default=1.0)
    p.add_argument("--teacher-mix-final", type=float, default=0.0)
    p.add_argument("--teacher-mix-rounds", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--aggregate-capacity", type=int, default=0,
                   help="DAgger dataset reservoir size in sequences "
                        "(0 = train on latest round only, round-1 behavior)")
    p.add_argument("--grad-steps-per-round", type=int, default=0,
                   help="minibatch updates per round from the aggregate "
                        "(reference: ~913/round avg, 146k total)")
    p.add_argument("--teachers-per-round", type=int, default=0,
                   help="collect from a random subset of K teachers each "
                        "round (0 = all). The reference collects ~470k "
                        "env-steps/round (75.3M/160); with T=500, M=8 that "
                        "is ~118 teachers/round")
    p.add_argument("--standardize", action="store_true",
                   help="fit an observation normalizer on the round-0 "
                        "teacher-driven data (frozen afterwards) and fold "
                        "it into the exported student (exact)")
    p.add_argument("--diagnostics", action="store_true",
                   help="log per-round loss decomposition: fresh-round "
                        "loss, per-action-dim MSE, teacher-disagreement "
                        "floor (diagnostics/* tags)")
    p.add_argument("--lr-final-scale", type=float, default=0.05,
                   help="cosine LR floor as a fraction of peak LR")
    p.add_argument("--eval-max-angle", type=float, default=0.0,
                   help="eval-parity InitConfig.max_angle for evaluation/* "
                        "and crazyflie/* tags (0 = use training init)")
    p.add_argument("--collect-angle-power", type=float, default=1.0,
                   help="init-severity curriculum for the DAgger collect: "
                        "start attitude angle = pi * u^(1/p). p=1 is the "
                        "uniform reference draw; p>1 oversamples near-pi "
                        "starts (types.InitConfig.angle_power)")
    p.add_argument("--demo-tilt", type=float, default=0.0,
                   help="demonstration injection: collect states tilted "
                        "beyond this angle (rad) get DAgger labels from "
                        "the scripted recovery controller instead of the "
                        "SAC teacher (env.recovery; MIGRATION §6). "
                        "0 = off. The eval-parity protocol (max_angle 1.0) "
                        "stays below any sensible threshold, so parity "
                        "tags measure the unchanged hover behavior")
    p.add_argument("--demo-rate", type=float, default=0.0,
                   help="extend the demo-label criterion to tilt > "
                        "--demo-tilt OR |w| > this (rad/s): covers the "
                        "demonstrator's arrest phase, whose states are "
                        "upright-ish but fast — teacher labels there are "
                        "extrapolation garbage (round-5 demoDiag "
                        "diagnosis). 0 = tilt-only")
    p.add_argument("--demo-rollout-frac", type=float, default=0.0,
                   help="fraction of each teacher's collect envs EXECUTED "
                        "by the scripted demonstrator for the whole run "
                        "(state coverage of the recovery trajectory — the "
                        "round-5 fix for the null demo640 measurement; "
                        "DistillConfig.demo_rollout_frac)")
    p.add_argument("--demo-w-cap", type=float, default=10.0,
                   help="demonstrator rate cap (999 + --demo-adaptive = "
                        "physics-pure per-airframe caps)")
    p.add_argument("--demo-k-w", type=float, default=30.0,
                   help="demonstrator rate-PD gain ceiling")
    p.add_argument("--demo-c-flip", type=float, default=1.0,
                   help="adaptive cap: flip-authority coefficient")
    p.add_argument("--demo-c-lag", type=float, default=0.8,
                   help="adaptive cap: motor-lag arrest coefficient")
    p.add_argument("--demo-c-bw", type=float, default=1.5,
                   help="adaptive cap: rate-loop bandwidth coefficient")
    p.add_argument("--demo-adaptive", action="store_true",
                   help="per-airframe adaptive demonstrator gain caps "
                        "(env.recovery.adaptive_gain_caps) for demo labels "
                        "and demo-driven envs")
    p.add_argument("--severe-weight", type=float, default=1.0,
                   help="BPTT loss weight on frames tilted past "
                        "--severe-tilt (weight-normalized; 1.0 = off)")
    p.add_argument("--severe-tilt", type=float, default=1.2,
                   help="tilt threshold (rad) for --severe-weight")
    p.add_argument("--student-hidden", type=int, default=16,
                   help="student GRU width; 16 = reference architecture "
                        "(2,084 params). Other widths are a capacity "
                        "ablation — exports remain schema-valid but are "
                        "not reference-parity")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--experiments-dir", default="experiments")
    p.add_argument("--eval-every-rounds", type=int, default=5)
    args = p.parse_args(argv)

    import dataclasses as _dc0

    env = L2F(EnvConfig(init=_dc0.replace(
        EnvConfig().init, angle_power=args.collect_angle_power)))
    fullinit_env = L2F(EnvConfig()) if args.collect_angle_power != 1.0 else env
    teacher_actors, airframes = load_teachers(args.manifest)
    total_grad = args.grad_steps_per_round * args.rounds
    cfg = post_training.DistillConfig(
        envs_per_teacher=args.envs_per_teacher,
        epochs_per_round=args.epochs_per_round,
        rollout_length=env.EPISODE_LENGTH,
        teacher_mix_initial=args.teacher_mix_initial,
        teacher_mix_final=args.teacher_mix_final,
        teacher_mix_decay_rounds=args.teacher_mix_rounds,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        aggregate_capacity=args.aggregate_capacity,
        grad_steps_per_round=args.grad_steps_per_round,
        total_grad_steps=total_grad if args.aggregate_capacity else 0,
        lr_final_scale=args.lr_final_scale,
        teachers_per_round=args.teachers_per_round,
        standardize=args.standardize,
        diagnostics=args.diagnostics,
        student_hidden=args.student_hidden,
        demo_tilt=args.demo_tilt,
        demo_rate=args.demo_rate,
        demo_rollout_frac=args.demo_rollout_frac,
        demo_adaptive=args.demo_adaptive,
        demo_w_cap=args.demo_w_cap,
        demo_k_w=args.demo_k_w,
        demo_c_flip=args.demo_c_flip,
        demo_c_lag=args.demo_c_lag,
        demo_c_bw=args.demo_c_bw,
        severe_weight=args.severe_weight,
        severe_tilt=args.severe_tilt,
    )
    run = Run(base_dir=args.experiments_dir, name="post_training")
    run.snapshot_config({"cfg": cfg, "seed": args.seed, "manifest": args.manifest})

    # held-out airframe (the reference's `crazyflie/*` tags)
    crazyflie = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), presets.crazyflie()
    )
    k_eval = jax.random.key(args.seed + 1)

    # evaluation/* and crazyflie/* use the measured eval-parity init
    # (apps/eval_parity.py; VERDICT r1 #3) so the tags are comparable with
    # the reference tfevents; fullinit/* keeps the harsher training-init
    # numbers for continuity with round-1 artifacts.
    if args.eval_max_angle > 0:
        # single source of truth: the canonical measured protocol config,
        # with only the CLI-swept angle overridden (types.eval_parity_init)
        import dataclasses as _dc

        eval_env = L2F(EnvConfig(init=_dc.replace(
            eval_parity_init(), max_angle=args.eval_max_angle)))
    else:
        eval_env = env

    def log_fn(tag, value, step):
        run.writer.scalar(tag, value, step)

    def round_hook(r, student, env_steps):
        if (r + 1) % args.eval_every_rounds:
            return
        stats = evaluate_student(eval_env, student, airframes, k_eval)
        cf = evaluate_student(eval_env, student, crazyflie, k_eval, n_envs_per=16)
        scalars = {
            "evaluation/return/mean": float(stats.return_mean),
            "evaluation/return/std": float(stats.return_std),
            "evaluation/episode_length/mean": float(stats.episode_length_mean),
            "evaluation/episode_length/std": float(stats.episode_length_std),
            "evaluation/share_terminated": float(stats.share_terminated),
            "crazyflie/return/mean": float(cf.return_mean),
            "crazyflie/episode_length/mean": float(cf.episode_length_mean),
            "crazyflie/share_terminated": float(cf.share_terminated),
        }
        if eval_env is not env:
            # fullinit/* stays on the UNIFORM-to-pi init regardless of any
            # --collect-angle-power curriculum, so the tag remains
            # comparable across rounds/runs.
            fstats = evaluate_student(fullinit_env, student, airframes, k_eval)
            scalars.update(
                {
                    "fullinit/return/mean": float(fstats.return_mean),
                    "fullinit/episode_length/mean": float(
                        fstats.episode_length_mean
                    ),
                    "fullinit/share_terminated": float(fstats.share_terminated),
                }
            )
        run.log(scalars, env_steps)
        # periodic checkpoint (reference: checkpoint per eval cadence)
        path = run.checkpoint_path(env_steps)
        ckpt_h5.save_actor(path, student, checkpoint_name=run.name)

    student, history = post_training.distill(
        jax.random.key(args.seed),
        env,
        teacher_actors,
        airframes,
        cfg,
        n_rounds=args.rounds,
        log_fn=log_fn,
        round_hook=round_hook,
    )

    final_path = run.checkpoint_path(0).replace("000000000000", "final")
    ckpt_h5.save_actor(final_path, student, checkpoint_name=run.name)
    err = ckpt_h5.verify_checkpoint(final_path)
    run.close()
    print(f"student: {final_path}  self-test max-err: {err:.2e}  "
          f"final loss: {history[-1]:.4f}")
    return final_path


if __name__ == "__main__":
    main()
