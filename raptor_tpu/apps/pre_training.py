"""CLI: SAC teacher pre-training — the reference `foundation_policy_pre_training`
(README:207) redesigned for TPU.

Two modes:
- single-airframe (reference-compatible):
    python -m raptor_tpu.apps.pre_training dynamics_parameters/7.json
- population mode (the idiomatic TPU path — K teachers as ONE program,
  replacing the `seq 0 999 | xargs` process farm):
    python -m raptor_tpu.apps.pre_training --population 64 --super-steps 500

Teacher checkpoints land in extrack run dirs
(`experiments/<EXPERIMENT>/<timestamp>_teacher{i}/checkpoints/...h5`), and a
manifest `checkpoints.txt` is written for post-training (the reference's
`extract_checkpoints.sh` output, README:213-215).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.distill import population
from raptor_tpu.env import EnvConfig, L2F
from raptor_tpu.env.io import load_params_json, params_to_dict, save_params_json
from raptor_tpu.rl import sac
from raptor_tpu.utils.extrack import Run


def export_teachers(run, states, airframes, n_teachers, final_step):
    """Export every teacher actor + its airframe JSON and write the
    checkpoints.txt manifest (the reference's extract_checkpoints.sh
    output, README:213-215).

    Pulls the WHOLE stacked population to host first (one d2h per pytree
    leaf) and slices in numpy: per-teacher device slicing is ~4k tiny eager
    dispatches through the remote tunnel, each a distinct XLA program
    (static slice index) that must compile on a cold cache — observed to
    take longer than the training run itself after a cache wipe.

    Called periodically during training so a hung run — one lost tunnel RPC
    blocks the client forever — still leaves a complete, slightly-stale
    teacher population on disk.  EVERY file (teacher h5s, dynamics JSONs,
    manifest) is written to a .tmp path and os.replace()d: a SIGKILL mid
    h5py write must never leave a truncated file that a still-valid manifest
    references (ADVICE r2)."""
    host_actor = jax.tree.map(np.asarray, states.sac.actor)
    host_airframes = jax.tree.map(np.asarray, airframes)
    manifest = []
    for i in range(n_teachers):
        actor_i = jax.tree.map(lambda x: x[i], host_actor)
        path = run.checkpoint_path(final_step)
        path = path.replace(".h5", f"_teacher{i}.h5")
        ckpt_h5.save_mlp_actor(path + ".tmp", actor_i,
                               meta={"teacher_index": i})
        os.replace(path + ".tmp", path)
        frame_path = path.replace(".h5", "_dynamics.json")
        save_params_json(frame_path + ".tmp",
                         jax.tree.map(lambda x: x[i], host_airframes))
        os.replace(frame_path + ".tmp", frame_path)
        manifest.append(path)
    manifest_path = os.path.join(run.dir, "checkpoints.txt")
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(manifest) + "\n")
    os.replace(tmp, manifest_path)
    return manifest_path


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("dynamics_json", nargs="*", help="airframe JSON file(s)")
    p.add_argument("--population", type=int, default=0,
                   help="sample K fresh airframes instead of reading JSONs")
    p.add_argument("--envs-per-teacher", type=int, default=32)
    p.add_argument("--super-steps", type=int, default=200)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="super-steps batched per jitted dispatch (amortizes "
                        "per-call latency; logging cadence coarsens)")
    p.add_argument("--unroll-inner", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Python-unroll the batched super-steps instead of "
                        "lax.scan (avoids the scan carry's replay-ring "
                        "double-buffer copy; measured 1.32x on v5e, "
                        "artifacts/profile_unroll.json; ~steps-per-call x "
                        "longer one-time compile). --no-unroll-inner for "
                        "the scan path")
    p.add_argument("--replay-capacity", type=int, default=4096,
                   help="replay ring rows per teacher (HBM: K x cap x envs "
                        "x ~68 floats)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--experiments-dir", default="experiments")
    p.add_argument("--eval-every", type=int, default=20)
    p.add_argument("--log-every", type=int, default=10,
                   help="pull training metrics to host every N dispatches. "
                        "Each pull is 3 device->host RPCs through the "
                        "remote-device tunnel that force a sync and break "
                        "dispatch pipelining — measured 2.14 s/dispatch "
                        "with per-dispatch pulls vs 0.92 s compute "
                        "(wave seed 900, round 3)")
    p.add_argument("--compute-dtype", default=None,
                   choices=[None, "bfloat16"],
                   help="learner matmul dtype: bfloat16 runs actor/critic "
                        "matmuls (fwd+bwd) on the MXU with f32 accumulation "
                        "(master weights/optimizer stay f32); default exact "
                        "f32")
    p.add_argument("--stack-critics", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="twin critics as one batched matmul per layer "
                        "(numerically identical, fewer ops)")
    p.add_argument("--flat-optim", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="optax.flatten the adam states (identical math, one "
                        "fused vector op instead of per-leaf ops)")
    p.add_argument("--init-angle-power", type=float, default=1.0,
                   help="init-severity curriculum for teacher training: "
                        "start attitude angle = max_angle * u^(1/p); p>1 "
                        "oversamples severe starts (types.InitConfig."
                        "angle_power)")
    p.add_argument("--angular-velocity-weight", type=float, default=None,
                   help="override RewardConfig.angular_velocity_weight for "
                        "TEACHER training only (recovery shaping, round-4 "
                        "failure-mode diagnosis: pi-start failures are "
                        "100%% bottom-of-box exits while righting at ~3 "
                        "rad/s — the |w|^2 penalty prices out the fast "
                        "flip the 0.6 m box demands; apps/failure_modes)."
                        " DAgger transfers actions only, so students are "
                        "still evaluated on the standard reward")
    p.add_argument("--action-weight", type=float, default=None,
                   help="override RewardConfig.action_weight for teacher "
                        "training (see --angular-velocity-weight)")
    p.add_argument("--sample-rows", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="row-contiguous replay sampling: minibatch = "
                        "batch/n_envs random whole time rows instead of "
                        "scattered (t, e) gathers (measured ~88%% of the "
                        "train phase); see replay."
                        "transition_buffer_sample_rows")
    p.add_argument("--demo-seed-steps", type=int, default=0,
                   help="DDPGfD replay seeding (MIGRATION §6 lever 1b): "
                        "run N scripted-demonstrator collect super-steps "
                        "after the random warmup, so critics see the fast "
                        "flip's value from step 0. Pair with "
                        "--init-angle-power so the demos start severe")
    p.add_argument("--demo-every", type=int, default=0,
                   help="additionally run one demonstrator collect every "
                        "N training super-steps (keeps ~H/N of the ring "
                        "demonstration data against eviction; 0 = off)")
    p.add_argument("--demo-adaptive", action="store_true",
                   help="per-airframe adaptive demonstrator gain caps "
                        "(env.recovery.adaptive_gain_caps)")
    p.add_argument("--checkpoint-every", type=int, default=500,
                   help="also export the full teacher population every N "
                        "super-steps (overwrites in place) so a hung or "
                        "killed run still leaves a usable manifest; 0 = "
                        "final export only")
    args = p.parse_args(argv)

    import dataclasses as _dc

    base = EnvConfig()
    rw = base.reward
    if args.angular_velocity_weight is not None:
        rw = _dc.replace(rw, angular_velocity_weight=args.angular_velocity_weight)
    if args.action_weight is not None:
        rw = _dc.replace(rw, action_weight=args.action_weight)
    env = L2F(EnvConfig(
        init=_dc.replace(base.init, angle_power=args.init_angle_power),
        reward=rw,
    ))
    key = jax.random.key(args.seed)
    k_air, k_init, k_eval = jax.random.split(key, 3)

    if args.population:
        airframes = population.sample_teacher_airframes(k_air, args.population)
        n_teachers = args.population
    else:
        if not args.dynamics_json:
            p.error("pass dynamics JSON files or --population K")
        frames = [load_params_json(f) for f in args.dynamics_json]
        airframes = jax.tree.map(lambda *xs: jax.numpy.stack(xs), *frames)
        n_teachers = len(frames)

    pop_cfg = population.PopulationConfig(
        n_teachers=n_teachers,
        envs_per_teacher=args.envs_per_teacher,
        replay_capacity=args.replay_capacity,
        sample_rows=args.sample_rows,
    )
    sac_cfg = sac.SACConfig(
        compute_dtype=args.compute_dtype,
        stack_critics=args.stack_critics,
        flat_optim=args.flat_optim,
    )
    states, env_params, run_cfg = population.population_init(
        k_init, env, airframes, pop_cfg, sac_cfg
    )
    warmup = population.make_population_warmup(env, run_cfg)
    if args.steps_per_call > 1:
        super_step = population.make_population_multi_step(
            env, run_cfg, sac_cfg, args.steps_per_call,
            unroll=args.unroll_inner,
        )
    else:
        super_step = population.make_population_super_step(env, run_cfg, sac_cfg)
    evaluator = population.make_population_eval(env, 8, env.EPISODE_LENGTH)

    run = Run(base_dir=args.experiments_dir, name="pre_training")
    run.snapshot_config(
        {
            "pop_cfg": pop_cfg,
            "sac_cfg": sac_cfg,
            "seed": args.seed,
            # host-pull once, slice in numpy (device-side per-index slicing
            # is a fresh tiny XLA compile per index through the tunnel)
            "airframes": [
                params_to_dict(jax.tree.map(lambda x: x[i], hf))
                for hf in (jax.tree.map(np.asarray, airframes),)
                for i in range(min(n_teachers, 8))
            ],
        }
    )

    demo_collect = None
    if args.demo_seed_steps or args.demo_every:
        demo_collect = population.make_population_demo_collect(
            env, run_cfg, adaptive=args.demo_adaptive
        )

    for _ in range(pop_cfg.warmup_super_steps):
        states = warmup(states, env_params)
    for _ in range(args.demo_seed_steps):
        states = demo_collect(states, env_params)
    env_steps_per = (
        run_cfg.rollout_length * run_cfg.n_envs * args.steps_per_call
    )
    for i in range(args.super_steps):
        states, metrics = super_step(states, env_params)
        if args.demo_every and (i + 1) % args.demo_every == 0:
            states = demo_collect(states, env_params)
        step = (i + 1) * env_steps_per
        if args.log_every and (i + 1) % args.log_every == 0:
            run.log(
                {
                    "critic_loss/mean": float(np.mean(np.asarray(metrics.critic_loss))),
                    "actor_loss/mean": float(np.mean(np.asarray(metrics.actor_loss))),
                    "alpha/mean": float(np.mean(np.asarray(metrics.alpha))),
                },
                step,
            )
        if args.eval_every and (i + 1) % args.eval_every == 0:
            stats = evaluator(
                states.sac, airframes, jax.random.split(k_eval, n_teachers)
            )
            run.log(
                {
                    "evaluation/return/mean": float(np.mean(np.asarray(stats.return_mean))),
                    "evaluation/return/std": float(np.mean(np.asarray(stats.return_std))),
                    "evaluation/episode_length/mean": float(
                        np.mean(np.asarray(stats.episode_length_mean))
                    ),
                    "evaluation/share_terminated": float(
                        np.mean(np.asarray(stats.share_terminated))
                    ),
                },
                step,
            )
        if args.checkpoint_every and (i + 1) % args.checkpoint_every == 0:
            export_teachers(
                run, states, airframes, n_teachers,
                args.super_steps * env_steps_per,
            )

    manifest_path = export_teachers(
        run, states, airframes, n_teachers, args.super_steps * env_steps_per
    )
    run.close()
    print(f"teachers: {n_teachers}  manifest: {manifest_path}")
    return manifest_path


if __name__ == "__main__":
    main()
