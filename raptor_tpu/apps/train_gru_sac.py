"""CLI: recurrent (GRU) SAC with domain randomization — BASELINE config 3
("single-host SAC with GRU sequence replay + domain randomization").

The end-to-end recurrent path of the foundation recipe: N domain-randomized
airframes, GRU actor (foundation-policy backbone) + recurrent twin critics,
sequence replay with reset-masked BPTT.

    python -m raptor_tpu.apps.train_gru_sac --n-envs 256 --super-steps 2000
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, L2F, sample_population
from raptor_tpu.policy import network as gru_net
from raptor_tpu.rl import evaluation, runner_gru, sac_gru
from raptor_tpu.utils.extrack import Run


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--n-envs", type=int, default=256)
    p.add_argument("--super-steps", type=int, default=1000)
    p.add_argument("--rollout-length", type=int, default=64)
    p.add_argument("--gradient-steps", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--burn-in", type=int, default=8,
                   help="window steps that only warm up hidden states (no loss)")
    p.add_argument("--warmup-super-steps", type=int, default=8)
    p.add_argument("--steps-per-call", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--eval-max-angle", type=float, default=0.0,
                   help="eval-parity InitConfig.max_angle for the "
                        "evaluation/* tags (0 = training init) — use 1.0 "
                        "for numbers comparable with the reference log "
                        "(apps/eval_parity.py protocol)")
    p.add_argument("--privileged-critics",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="critics consume the full privileged obs "
                        "(normalized-dynamics tail) while the actor sees "
                        "the 22-dim policy slice — the MLP-SAC teachers' "
                        "asymmetric structure. --no-privileged-critics "
                        "restores the round-3 symmetric learner")
    p.add_argument("--critic-hidden", type=int, default=0,
                   help="critic GRU width (0 = same as actor hidden_dim)")
    p.add_argument("--init-actor", default=None,
                   help="RL fine-tuning (MIGRATION §6 lever 4): initialize "
                        "the actor backbone from a distilled student .h5 "
                        "(reference schema). dense_0/gru_1 copy exactly; "
                        "the student's 4-dim head becomes the mu half of "
                        "the squashed-Gaussian head (log-std half starts "
                        "at --init-log-std). Note tanh(mu) mildly "
                        "compresses the student's clip(identity) actions")
    p.add_argument("--init-log-std", type=float, default=-2.0)
    p.add_argument("--actor-lr", type=float, default=3e-4)
    p.add_argument("--critic-lr", type=float, default=3e-4)
    p.add_argument("--init-angle-power", type=float, default=1.0,
                   help="training-init severity exponent "
                        "(types.InitConfig.angle_power); >1 oversamples "
                        "severe starts for recovery fine-tuning")
    p.add_argument("--experiments-dir", default="experiments")
    args = p.parse_args(argv)

    import dataclasses as _dc0

    env = L2F(EnvConfig(init=_dc0.replace(
        EnvConfig().init, angle_power=args.init_angle_power)))
    if args.eval_max_angle > 0:
        import dataclasses as _dc

        from raptor_tpu.env.types import eval_parity_init

        eval_env = L2F(EnvConfig(init=_dc.replace(
            eval_parity_init(), max_angle=args.eval_max_angle)))
    else:
        eval_env = env
    run_cfg = runner_gru.GRURunnerConfig(
        n_envs=args.n_envs,
        rollout_length=args.rollout_length,
        gradient_steps=args.gradient_steps,
        batch_size=args.batch_size,
        sample_seq_len=args.seq_len,
        replay_capacity=4096,
    )
    cfg = sac_gru.SACGRUConfig(
        burn_in=args.burn_in,
        actor_obs_dim=(run_cfg.actor_obs_dim if args.privileged_critics
                       else None),
        critic_hidden_dim=args.critic_hidden or None,
        actor_lr=args.actor_lr,
        critic_lr=args.critic_lr,
    )
    key = jax.random.key(args.seed)
    k_pop, k_init, k_eval = jax.random.split(key, 3)
    params = sample_population(k_pop, args.n_envs)
    state = runner_gru.gru_trainer_init(k_init, env, params, run_cfg, cfg)
    if args.init_actor:
        # fine-tune from a distilled student (MIGRATION §6 lever 4); the
        # actor optimizer re-initializes for the grafted parameters.
        new_actor = sac_gru.graft_actor_from_student(
            state.learner.actor, ckpt_h5.load_actor(args.init_actor),
            env.ACTION_DIM, args.init_log_std,
        )
        a_optim = sac_gru._optims(cfg)[0]
        state = state.replace(learner=state.learner.replace(
            actor=new_actor, actor_opt=a_optim.init(new_actor)))
    if args.steps_per_call > 1:
        super_step = runner_gru.make_gru_multi_step(
            env, run_cfg, cfg, args.steps_per_call
        )
    else:
        super_step = runner_gru.make_gru_super_step(env, run_cfg, cfg)

    def warmup_step(state, params):
        return runner_gru.collect_sequences(
            state, env, params, run_cfg, cfg, random_actions=True
        )

    warmup = jax.jit(warmup_step, donate_argnums=(0,))

    run = Run(base_dir=args.experiments_dir, name="gru_sac")
    run.snapshot_config({"run_cfg": run_cfg, "cfg": cfg, "seed": args.seed})

    def evaluate_actor(learner):
        m = min(args.n_envs, 64)
        p_eval = sample_population(jax.random.fold_in(k_eval, 0), m)
        sf = sac_gru.recurrent_actor_step(learner.actor, cfg)
        stats = evaluation.evaluate(
            eval_env,
            p_eval,
            lambda h, o: sf(h, o[..., : run_cfg.actor_obs_dim]),
            gru_net.initial_hidden(learner.actor, m),
            k_eval,
            m,
            env.EPISODE_LENGTH,
        )
        return stats

    for _ in range(args.warmup_super_steps):
        state = warmup(state, params)
    steps_per = run_cfg.rollout_length * run_cfg.n_envs * args.steps_per_call
    for i in range(args.super_steps):
        state, metrics = super_step(state, params)
        step = (i + 1) * steps_per
        if (i + 1) % 10 == 0:
            run.log(
                {
                    "critic_loss": float(metrics.critic_loss),
                    "actor_loss": float(metrics.actor_loss),
                    "alpha": float(metrics.alpha),
                    "entropy": float(metrics.entropy),
                },
                step,
            )
        if args.eval_every and (i + 1) % args.eval_every == 0:
            stats = evaluate_actor(state.learner)
            run.log(
                {
                    "evaluation/return/mean": float(stats.return_mean),
                    "evaluation/return/std": float(stats.return_std),
                    "evaluation/episode_length/mean": float(stats.episode_length_mean),
                    "evaluation/share_terminated": float(stats.share_terminated),
                },
                step,
            )

    # export the actor's GRU backbone in the reference schema (mu head only:
    # first ACTION_DIM rows of the dense_2 output layer)
    actor = jax.tree.map(np.asarray, state.learner.actor)
    mu_actor = {
        "dense_0": actor["dense_0"],
        "gru_1": actor["gru_1"],
        "dense_2": {
            "weights": actor["dense_2"]["weights"][: env.ACTION_DIM],
            "biases": actor["dense_2"]["biases"][: env.ACTION_DIM],
        },
    }
    path = run.checkpoint_path(args.super_steps * steps_per)
    ckpt_h5.save_actor(path, mu_actor, checkpoint_name=run.name)
    run.close()
    print(f"gru-sac actor: {path}")
    return path


if __name__ == "__main__":
    main()
