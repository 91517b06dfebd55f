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
    same (alive, snapshot) contract as apps.failure_modes.probe."""
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
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    report = {"angle": args.angle, "controller": "geometric flip-arrest-hover"}
    for tag, airframe in [("aggregate", "random"), ("crazyflie", "crazyflie")]:
        env = L2F(EnvConfig(init=InitConfig(max_angle=args.angle)))
        key = jax.random.key(args.seed)
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
        m = args.n_airframes * args.envs_per
        alive, snap = jax.jit(lambda k, pp=params: rollout(env, pp, k, m))(key)
        alive, snap = jax.tree.map(np.asarray, (alive, snap))
        died = snap["t"] >= 0
        report[tag] = {
            "episodes": m,
            "share_terminated": float(died.mean()),
            "mean_survival": float(
                np.where(died, snap["t"], env.EPISODE_LENGTH).mean()
            ),
            "cause/position": float(snap["pos_hit"][died].mean()) if died.any() else None,
            "cause/angular_rate": float(snap["w_hit"][died].mean()) if died.any() else None,
        }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
