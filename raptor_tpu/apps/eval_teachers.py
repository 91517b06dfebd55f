"""Evaluate a teacher pack/manifest: per-teacher deterministic eval on its
own airframe, aggregate stats as JSON.

Quality-gate tool for pre-training throughput changes (round 4: the
row-sampling learner path): two waves trained with different learner
configs are compared by the return distribution of their teachers under
the IDENTICAL eval program (same init distribution, same episode cap) —
the reference's per-teacher eval contract (SURVEY §3.5 pre_training's
evaluation cadence).

Usage:
    python -m raptor_tpu.apps.eval_teachers PACK_OR_MANIFEST [...] \
        --episodes 8 --out report.json
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from raptor_tpu.apps.post_training import load_teachers
    from raptor_tpu.env import EnvConfig, L2F
    from raptor_tpu.rl import evaluation

    p = argparse.ArgumentParser()
    p.add_argument("packs", nargs="+",
                   help="teacher pack .npz / checkpoints.txt manifests")
    p.add_argument("--episodes", type=int, default=8,
                   help="eval episodes per teacher")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-angle", type=float, default=None,
                   help="override the init max_angle (rad); e.g. 0.2 "
                        "probes hover competence of each teacher on its "
                        "own airframe (round-5 slow-motor tail diagnosis)")
    p.add_argument("--out", default=None, help="JSON report path")
    args = p.parse_args(argv)

    if args.max_angle is not None:
        from raptor_tpu.env.types import InitConfig

        env = L2F(EnvConfig(init=InitConfig(max_angle=args.max_angle)))
    else:
        env = L2F(EnvConfig())

    def member_eval(actor, airframe, key):
        p_eval = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (args.episodes,) + x.shape),
            airframe,
        )
        step_fn, carry = evaluation.mlp_policy_step(actor)
        return evaluation.evaluate(
            env, p_eval, step_fn, carry, key, args.episodes,
            env.EPISODE_LENGTH,
        )

    v_eval = jax.jit(jax.vmap(member_eval, in_axes=(0, 0, 0)))

    report = {}
    for path in args.packs:
        actors, airframes = load_teachers(path)
        k = jax.tree.leaves(airframes)[0].shape[0]
        keys = jax.random.split(jax.random.key(args.seed), k)
        stats = v_eval(actors, airframes, keys)
        ret = np.asarray(stats.return_mean)
        length = np.asarray(stats.episode_length_mean)
        term = np.asarray(stats.share_terminated)
        report[path] = {
            "teachers": int(k),
            "episodes_per_teacher": args.episodes,
            "return/mean": float(ret.mean()),
            "return/std_across_teachers": float(ret.std()),
            "return/p10": float(np.percentile(ret, 10)),
            "return/p50": float(np.percentile(ret, 50)),
            "return/p90": float(np.percentile(ret, 90)),
            "episode_length/mean": float(length.mean()),
            "share_terminated/mean": float(term.mean()),
            "per_teacher_return": [float(x) for x in ret],
            "per_teacher_share_terminated": [float(x) for x in term],
        }
        print(json.dumps({path: {kk: vv for kk, vv in report[path].items()
                                 if kk != "per_teacher_return"}}),
              flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
