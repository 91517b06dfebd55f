"""CLI: classify WHY severe-attitude episodes terminate.

Round-4 diagnostic for the pi-start ceiling: every data-side lever
(population size, teacher budget, collect/teacher init severity) plateaus
the student at ~320/500 aggregate at pi starts while the recoverability
bound (`apps/recoverability.py`) says ~100% of those starts are
physically recoverable. This tool attributes each termination to its
tripped bound (SURVEY §3.3 termination contract; env.types
TerminationConfig: |p_i| > 0.6 m box, |w| > 35 rad/s, non-finite) and
when it happens (failed-flip early vs post-recovery drift late), which
separates "cannot right itself" from "rights itself but exits the box".

    RAPTOR_PLATFORM=cpu python -m raptor_tpu.apps.failure_modes \
        --checkpoint artifacts/student_currP4.h5 --angle 3.14159 \
        --out artifacts/failure_modes_currP4.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, L2F, presets, sample_population
from raptor_tpu.env.types import InitConfig
from raptor_tpu.rl import evaluation


def probe(policy_params, angle, key, n_airframes, envs_per, airframe="random"):
    env = L2F(EnvConfig(init=InitConfig(max_angle=angle)))
    c = env.config.termination
    if airframe == "random":
        frames = sample_population(jax.random.fold_in(key, 7), n_airframes)
        params = jax.tree.map(lambda x: jnp.repeat(x, envs_per, axis=0), frames)
        m = n_airframes * envs_per
    else:
        one = getattr(presets, airframe)()
        params = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_airframes * envs_per,) + x.shape), one
        )
        m = n_airframes * envs_per

    policy_step, carry0 = evaluation.gru_policy_step(policy_params, m)
    v_reset, _ = env.vector_ops()
    v_dstep = jax.vmap(env.dynamics_step, in_axes=(0, 0, 0, 0))
    v_obs = jax.vmap(env.observe, in_axes=(0, 0, 0))
    v_term = jax.vmap(env.terminated, in_axes=(0, 0))

    es, obs = v_reset(jax.random.split(key, m), params)

    def attitude_angle(q):
        # rotation angle from identity: 2*acos(|q_w|)
        return 2.0 * jnp.arccos(jnp.clip(jnp.abs(q[:, 0]), 0.0, 1.0))

    def body(cr, t):
        state, obs, pcarry, alive, snap, k = cr
        pcarry, action = policy_step(pcarry, obs)
        action = jnp.clip(action, -1.0, 1.0)
        k, k_step = jax.random.split(k)
        stepped, _ = v_dstep(params, state, action, jax.random.split(k_step, m))
        keep = alive.reshape((m,) + (1,) * 1)
        next_state = jax.tree.map(
            lambda a, b: a * alive.reshape((m,) + (1,) * (a.ndim - 1))
            + b * (1.0 - alive.reshape((m,) + (1,) * (a.ndim - 1))),
            stepped,
            state,
        )
        del keep
        terminated = v_term(params, next_state)
        new_term = (alive > 0.5) & terminated
        # cause attribution on the state that tripped the bound
        pos_hit = jnp.any(jnp.abs(next_state.position) > c.position_bound, axis=-1)
        w_hit = (
            jnp.sum(next_state.angular_velocity**2, axis=-1)
            > c.angular_velocity_bound**2
        )
        finite = jnp.all(jnp.isfinite(next_state.position), axis=-1)
        z_exit = jnp.abs(next_state.position[:, 2]) > c.position_bound
        upd = lambda s, v: jnp.where(new_term, v, s)
        snap = dict(
            t=upd(snap["t"], t),
            pos_hit=upd(snap["pos_hit"], pos_hit),
            w_hit=upd(snap["w_hit"], w_hit),
            nonfinite=upd(snap["nonfinite"], ~finite),
            z_exit=upd(snap["z_exit"], z_exit),
            z_sign=upd(snap["z_sign"], jnp.sign(next_state.position[:, 2])),
            angle_at_term=upd(
                snap["angle_at_term"], attitude_angle(next_state.orientation)
            ),
            w_norm=upd(
                snap["w_norm"],
                jnp.sqrt(jnp.sum(next_state.angular_velocity**2, axis=-1)),
            ),
        )
        alive = alive * (1.0 - terminated.astype(jnp.float32))
        obs = v_obs(params, next_state, action)
        return (next_state, obs, pcarry, alive, snap, k), None

    snap0 = dict(
        t=jnp.full((m,), -1, jnp.int32),
        pos_hit=jnp.zeros((m,), bool),
        w_hit=jnp.zeros((m,), bool),
        nonfinite=jnp.zeros((m,), bool),
        z_exit=jnp.zeros((m,), bool),
        z_sign=jnp.zeros((m,), jnp.float32),
        angle_at_term=jnp.zeros((m,), jnp.float32),
        w_norm=jnp.zeros((m,), jnp.float32),
    )
    init = (es.dynamics, obs, carry0, jnp.ones((m,), jnp.float32), snap0, key)
    (_, _, _, alive, snap, _), _ = jax.lax.scan(
        body, init, jnp.arange(env.EPISODE_LENGTH)
    )
    return alive, snap


def summarize(alive, snap):
    died = snap["t"] >= 0
    n = len(alive)
    nd = int(died.sum())
    out = {
        "episodes": n,
        "terminated": nd,
        "share_terminated": nd / n,
    }
    if nd == 0:
        return out
    d = {k: v[died] for k, v in snap.items()}
    t = d["t"].astype(float)
    out.update(
        {
            # cause shares (can overlap; pos-only/w-only split them)
            "cause/position_box": float(d["pos_hit"].mean()),
            "cause/angular_rate": float(d["w_hit"].mean()),
            "cause/position_only": float((d["pos_hit"] & ~d["w_hit"]).mean()),
            "cause/angular_only": float((d["w_hit"] & ~d["pos_hit"]).mean()),
            "cause/nonfinite": float(d["nonfinite"].mean()),
            "cause/z_exit_given_pos": float(
                d["z_exit"][d["pos_hit"]].mean()
            ) if d["pos_hit"].any() else None,
            "cause/z_down_given_z_exit": float(
                (d["z_sign"][d["z_exit"]] < 0).mean()
            ) if d["z_exit"].any() else None,
            "t_term/mean": float(t.mean()),
            "t_term/p10": float(np.percentile(t, 10)),
            "t_term/p50": float(np.percentile(t, 50)),
            "t_term/p90": float(np.percentile(t, 90)),
            "t_term/share_first_50": float((t < 50).mean()),
            "t_term/share_first_100": float((t < 100).mean()),
            "angle_at_term/mean": float(d["angle_at_term"].mean()),
            "angle_at_term/share_gt_90deg": float(
                (d["angle_at_term"] > np.pi / 2).mean()
            ),
            "w_norm_at_term/mean": float(d["w_norm"].mean()),
        }
    )
    return out


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--angle", type=float, default=3.14159265)
    p.add_argument("--n-airframes", type=int, default=32)
    p.add_argument("--envs-per", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    policy = ckpt_h5.load_actor(args.checkpoint)
    report = {"checkpoint": args.checkpoint, "angle": args.angle}
    for tag, airframe in [("aggregate", "random"), ("crazyflie", "crazyflie")]:
        alive, snap = jax.jit(
            lambda k: probe(
                policy, args.angle, k, args.n_airframes, args.envs_per, airframe
            )
        )(jax.random.key(args.seed))
        alive, snap = jax.tree.map(np.asarray, (alive, snap))
        report[tag] = summarize(alive, snap)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
