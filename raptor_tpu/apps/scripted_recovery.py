"""Scripted full-attitude recovery: is the pi-start gap learnable headroom?

Round-4 chain of evidence: the recoverability bound says ~100% of pi
starts are physically recoverable (`apps/recoverability.py`), the
failure-mode probe says every student/teacher failure is a slow-flip
bottom-of-box exit at ~3.4 rad/s (`apps/failure_modes.py`), and neither
reward shaping nor init curricula teach SAC the fast flip (RESULTS §
round 4) — suggesting an *exploration* limit, not physics and not data.

This app closes the argument with a constructive witness: a scripted
geometric controller (privileged state access, no learning) that
executes the fast-flip-arrest-hover sequence under the FULL standard
dynamics (motor lag, thrust curves, randomized airframes) and standard
termination. If it survives pi starts where the best learned policy
terminates ~39%, the gap is proven learnable, and its rollouts are
usable as demonstrations (DDPGfD-style replay seeding or DAgger labels)
in the next round.

The controller itself lives in `raptor_tpu.env.recovery` (it doubles as
the DAgger demonstrator for distillation — docs/MIGRATION.md §6); this
app is the standalone evaluation harness.

    RAPTOR_PLATFORM=cpu python -m raptor_tpu.apps.scripted_recovery \
        --out artifacts/scripted_recovery.json
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.env import EnvConfig, L2F, presets, sample_population
from raptor_tpu.env.recovery import recovery_action as controller  # noqa: F401
from raptor_tpu.env.types import InitConfig


def rollout(env: L2F, params, key, m, **gains):
    """Standard-env rollout driven by the scripted controller; returns the
    same (alive, snapshot) contract as apps.failure_modes.probe.

    Gains may be python floats (baked constants) or jnp scalars traced
    through an enclosing jit — the grid sweep passes traced scalars so
    every configuration shares ONE compiled program (axon compiles are
    minutes; NOTES.md gotcha 1)."""
    v_reset, _ = env.vector_ops()
    v_dstep = jax.vmap(env.dynamics_step, in_axes=(0, 0, 0, 0))
    v_term = jax.vmap(env.terminated, in_axes=(0, 0))
    v_ctrl = jax.vmap(lambda p, s: controller(p, s, **gains))

    es, _ = v_reset(jax.random.split(key, m), params)

    def body(cr, t):
        state, alive, snap, k = cr
        action = v_ctrl(params, state)
        k, k_step = jax.random.split(k)
        stepped, _ = v_dstep(params, state, action, jax.random.split(k_step, m))
        next_state = jax.tree.map(
            lambda a, b: a * alive.reshape((m,) + (1,) * (a.ndim - 1))
            + b * (1.0 - alive.reshape((m,) + (1,) * (a.ndim - 1))),
            stepped,
            state,
        )
        terminated = v_term(params, next_state)
        new_term = (alive > 0.5) & terminated
        upd = lambda s, v: jnp.where(new_term, v, s)
        c = env.config.termination
        snap = dict(
            t=upd(snap["t"], t),
            pos_hit=upd(
                snap["pos_hit"],
                jnp.any(jnp.abs(next_state.position) > c.position_bound, -1),
            ),
            w_hit=upd(
                snap["w_hit"],
                jnp.sum(next_state.angular_velocity**2, -1)
                > c.angular_velocity_bound**2,
            ),
        )
        alive = alive * (1.0 - terminated.astype(jnp.float32))
        return (next_state, alive, snap, k), None

    snap0 = dict(
        t=jnp.full((m,), -1, jnp.int32),
        pos_hit=jnp.zeros((m,), bool),
        w_hit=jnp.zeros((m,), bool),
    )
    init = (es.dynamics, jnp.ones((m,), jnp.float32), snap0, key)
    (_, alive, snap, _), _ = jax.lax.scan(
        body, init, jnp.arange(env.EPISODE_LENGTH)
    )
    return alive, snap


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--angle", type=float, default=3.14159265)
    p.add_argument("--n-airframes", type=int, default=32)
    p.add_argument("--envs-per", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--adaptive", action="store_true",
                   help="per-airframe (w_cap, k_w) caps for the low-TWR/"
                        "slow-motor tail (env.recovery.adaptive_gain_caps; "
                        "MIGRATION §6 lever 3)")
    p.add_argument("--c-flip", type=float, default=1.0)
    p.add_argument("--c-lag", type=float, default=0.8)
    p.add_argument("--c-bw", type=float, default=1.5)
    p.add_argument("--w-cap", type=float, default=10.0,
                   help="base w_cap ceiling; set very high with --adaptive "
                        "to make the per-airframe physics caps THE gains "
                        "(they can then exceed the fixed optimum on "
                        "high-authority frames)")
    p.add_argument("--k-w", type=float, default=30.0,
                   help="base rate-PD gain ceiling (see --w-cap)")
    p.add_argument("--grid", default=None,
                   help="semicolon list of adaptive 'c_flip:c_lag:c_bw' "
                        "configs swept in ONE process with traced gain "
                        "scalars (a single compiled program); implies "
                        "--adaptive. Example: '1:0.8:1.5;1:0.6:1.0'")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.grid:
        configs = []
        for item in args.grid.split(";"):
            cf, cl, cb = (float(x) for x in item.split(":"))
            configs.append(dict(c_flip=cf, c_lag=cl, c_bw=cb))
    elif args.adaptive:
        configs = [dict(c_flip=args.c_flip, c_lag=args.c_lag, c_bw=args.c_bw)]
    else:
        configs = [None]

    report = {"angle": args.angle, "controller": "geometric flip-arrest-hover",
              "adaptive": configs[0] is not None,
              "w_cap": args.w_cap, "k_w": args.k_w, "runs": []}
    env = L2F(EnvConfig(init=InitConfig(max_angle=args.angle)))
    key = jax.random.key(args.seed)
    m = args.n_airframes * args.envs_per
    for tag, airframe in [("aggregate", "random"), ("crazyflie", "crazyflie")]:
        if airframe == "random":
            frames = sample_population(jax.random.fold_in(key, 7), args.n_airframes)
            params = jax.tree.map(
                lambda x: jnp.repeat(x, args.envs_per, axis=0), frames
            )
        else:
            one = presets.crazyflie()
            params = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x, (args.n_airframes * args.envs_per,) + x.shape
                ),
                one,
            )
        if configs[0] is None:
            run = jax.jit(
                lambda k, pp=params: rollout(env, pp, k, m, w_cap=args.w_cap,
                                             k_w=args.k_w)
            )
            outs = [(None, run(key))]
        else:
            run = jax.jit(
                lambda k, g, pp=params: rollout(
                    env, pp, k, m, adaptive=True,
                    w_cap=jnp.float32(args.w_cap), k_w=jnp.float32(args.k_w),
                    **g,
                )
            )
            outs = [
                (cfg, run(key, {kk: jnp.float32(v) for kk, v in cfg.items()}))
                for cfg in configs
            ]
        for cfg, (alive, snap) in outs:
            alive, snap = jax.tree.map(np.asarray, (alive, snap))
            died = snap["t"] >= 0
            entry = {
                "airframes": tag,
                "gains": cfg or "fixed (round-4 sweep optimum)",
                "episodes": m,
                "share_terminated": float(died.mean()),
                "mean_survival": float(
                    np.where(died, snap["t"], env.EPISODE_LENGTH).mean()
                ),
                "cause/position": float(snap["pos_hit"][died].mean()) if died.any() else None,
                "cause/angular_rate": float(snap["w_hit"][died].mean()) if died.any() else None,
            }
            report["runs"].append(entry)
            if len(configs) == 1:
                report[tag] = {k: v for k, v in entry.items()
                               if k not in ("airframes", "gains")}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
