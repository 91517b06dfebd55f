"""CLI: evaluate a policy checkpoint across the airframe distribution.

Evaluation mirror of the reference's periodic eval (5-stat contract,
SURVEY §3.4/§6.2) as a standalone tool:

    python -m raptor_tpu.apps.evaluate checkpoint.h5 --n-airframes 64
    python -m raptor_tpu.apps.evaluate --shipped --airframe crazyflie
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, L2F, presets, sample_population
from raptor_tpu.rl import evaluation


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", nargs="?", help="reference-schema .h5 policy")
    p.add_argument("--shipped", action="store_true",
                   help="evaluate the shipped reference checkpoint")
    p.add_argument("--airframe", choices=["random", "crazyflie", "x500"],
                   default="random")
    p.add_argument("--n-airframes", type=int, default=32)
    p.add_argument("--envs-per-airframe", type=int, default=8)
    p.add_argument("--episode-length", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fused", action="store_true",
                   help="use the Pallas fused policy+env eval kernel")
    args = p.parse_args(argv)

    if args.shipped or not args.checkpoint:
        from raptor_tpu.policy import shipped_checkpoint_path

        args.checkpoint = shipped_checkpoint_path()
    params = ckpt_h5.load_actor(args.checkpoint)

    env = L2F(EnvConfig())
    if args.airframe == "random":
        frames = sample_population(jax.random.key(args.seed), args.n_airframes)
    else:
        one = getattr(presets, args.airframe)()
        frames = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), one)

    stacked = jax.tree.map(
        lambda x: jnp.repeat(x, args.envs_per_airframe, axis=0), frames
    )
    m = jax.tree.leaves(stacked)[0].shape[0]
    t_max = args.episode_length or env.EPISODE_LENGTH
    if args.fused:
        from raptor_tpu.ops import pallas_eval

        v_reset, _ = env.vector_ops()
        es, _ = v_reset(
            jax.random.split(jax.random.key(args.seed + 1), m), stacked
        )
        _, alive, length, ret = pallas_eval.fused_policy_eval(
            params, stacked, es.dynamics, t_max,
            reward_config=env.config.reward,
        )
        out = {
            "checkpoint": args.checkpoint,
            "airframe": args.airframe,
            "episodes": m,
            "kernel": "fused",
            "return/mean": float(jnp.mean(ret)),
            "return/std": float(jnp.std(ret)),
            "episode_length/mean": float(jnp.mean(length)),
            "episode_length/std": float(jnp.std(length)),
            "share_terminated": float(1.0 - jnp.mean(alive)),
        }
        print(json.dumps(out, indent=2))
        return out
    step_fn, carry = evaluation.gru_policy_step(params, m)
    stats = evaluation.evaluate(
        env, stacked, step_fn, carry, jax.random.key(args.seed + 1), m,
        t_max,
    )
    out = {
        "checkpoint": args.checkpoint,
        "airframe": args.airframe,
        "episodes": m,
        "return/mean": float(stats.return_mean),
        "return/std": float(stats.return_std),
        "episode_length/mean": float(stats.episode_length_mean),
        "episode_length/std": float(stats.episode_length_std),
        "share_terminated": float(stats.share_terminated),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
