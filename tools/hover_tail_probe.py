"""Per-airframe termination attribution for the eval-parity AGGREGATE.

Round-5 flagship diagnosis: `rateFlag` (768-union incl. the DDPGfD
demo-seeded pack) tops the pi sweep but shows a flat ~9% termination at
EVERY angle — i.e. a few specific airframes fail even from near-hover
starts, where `demoRate` (same flags, 640-union) holds 0%.  This probe
replicates eval_parity's aggregate protocol exactly (same
`sample_population(fold_in(key,7), n)` draw, same repeat-per-airframe
layout, SURVEY §5.1.3 held-out-dynamics eval) but reports per-airframe
share_terminated + the airframe physics (TWR, motor tau, mass), so the
failing tail can be attributed to a physics region rather than guessed.

    RAPTOR_PLATFORM=cpu python tools/hover_tail_probe.py \
        artifacts/student_rateFlag.h5 artifacts/student_demoRate.h5 \
        --angle 0.2 --out artifacts/hover_tail_rateFlag.json
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def per_airframe_eval(env, params, policy_params, key, n_airframes, envs_per):
    """evaluation.evaluate's loop, but returning per-env (alive, length)."""
    from raptor_tpu.policy import network as policy_net

    m = n_airframes * envs_per
    v_reset, _ = env.vector_ops()
    v_dstep = jax.vmap(env.dynamics_step, in_axes=(0, 0, 0, 0))
    v_obs = jax.vmap(env.observe, in_axes=(0, 0, 0))
    v_term = jax.vmap(env.terminated, in_axes=(0, 0))

    es, obs = v_reset(jax.random.split(key, m), params)
    carry0 = policy_net.initial_hidden(policy_params, m)

    def body(carry, _):
        state, prev_action, obs, h, alive, length, k = carry
        h, action = policy_net.apply_step(policy_params, h, obs[..., :22])
        action = jnp.clip(action, -1.0, 1.0)
        k, k_step = jax.random.split(k)
        stepped, _ = v_dstep(params, state, action, jax.random.split(k_step, m))
        keep = alive
        next_state = jax.tree.map(
            lambda a, b: a * keep.reshape((m,) + (1,) * (a.ndim - 1))
            + b * (1.0 - keep.reshape((m,) + (1,) * (a.ndim - 1))),
            stepped,
            state,
        )
        terminated = v_term(params, next_state)
        length = length + alive.astype(jnp.int32)
        alive = alive * (1.0 - terminated.astype(jnp.float32))
        obs = v_obs(params, next_state, action)
        return (next_state, action, obs, h, alive, length, k), None

    init = (es.dynamics, jnp.zeros((m, 4), jnp.float32), obs, carry0,
            jnp.ones((m,), jnp.float32), jnp.zeros((m,), jnp.int32), key)
    (_, _, _, _, alive, length, _), _ = jax.lax.scan(
        body, init, None, length=env.EPISODE_LENGTH
    )
    return alive.reshape(n_airframes, envs_per), length.reshape(
        n_airframes, envs_per
    )


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("checkpoints", nargs="+", help="student .h5 paths")
    p.add_argument("--angle", type=float, default=0.2)
    p.add_argument("--n-airframes", type=int, default=32)
    p.add_argument("--envs-per", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fold", type=int, default=4,
                   help="fold_in applied to the seed key before use; 4 "
                        "matches eval_parity's student_aggregate row")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from raptor_tpu.checkpoint import h5 as ckpt_h5
    from raptor_tpu.env import EnvConfig, L2F, sample_population
    from raptor_tpu.env.types import InitConfig

    env = L2F(EnvConfig(init=InitConfig(max_angle=args.angle)))
    key = jax.random.fold_in(jax.random.key(args.seed), args.fold)
    # identical draw to eval_parity.evaluate_at_angle(airframe="random")
    frames = sample_population(jax.random.fold_in(key, 7), args.n_airframes)
    stacked = jax.tree.map(
        lambda x: jnp.repeat(x, args.envs_per, axis=0), frames
    )

    tmax = np.asarray(frames.thrust_curve).sum(1)
    twr = 4 * tmax / (np.asarray(frames.mass) * 9.81)
    tau = np.asarray(frames.motor_time_constant)
    mass = np.asarray(frames.mass)

    run = jax.jit(
        lambda pp, k: per_airframe_eval(
            env, stacked, pp, k, args.n_airframes, args.envs_per
        )
    )

    report = {"angle": args.angle, "per_airframe": []}
    results = {}
    for ck in args.checkpoints:
        policy = ckpt_h5.load_actor(ck)
        alive, length = run(policy, key)
        results[ck] = (np.asarray(1.0 - alive).mean(1),
                       np.asarray(length).mean(1))

    tags = [os.path.basename(c) for c in args.checkpoints]
    print(f"angle={args.angle}  per-airframe share_terminated")
    print(f"{'frame':>5} {'TWR':>6} {'tau':>6} {'mass':>6} | "
          + " ".join(f"{t[:18]:>18}" for t in tags))
    for i in range(args.n_airframes):
        terms = [results[c][0][i] for c in args.checkpoints]
        row = {
            "frame": i, "twr": float(twr[i]), "tau": float(tau[i]),
            "mass": float(mass[i]),
            **{t: {"share_terminated": float(results[c][0][i]),
                   "episode_length": float(results[c][1][i])}
               for t, c in zip(tags, args.checkpoints)},
        }
        report["per_airframe"].append(row)
        if any(t > 0 for t in terms):
            print(f"{i:>5} {twr[i]:>6.2f} {tau[i]:>6.3f} {mass[i]:>6.3f} | "
                  + " ".join(f"{t:>18.2f}" for t in terms))
    for t, c in zip(tags, args.checkpoints):
        print(f"total {t}: {results[c][0].mean():.4f}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
