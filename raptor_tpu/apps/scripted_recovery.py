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

Controller (per step, privileged state):
  1. attitude: rotate body +z onto a target direction — world up while
     tilted, the desired-acceleration direction once near-upright
     (position/velocity PD). Desired body rate = axis * min(w_cap, k*theta)
     (w_cap stays well under the 35 rad/s termination bound).
  2. torque = I (k_w (w_des - w)) + w x I w  (rate PD + gyroscopic ff).
  3. collective thrust = m * (a_des . z_b), floored while inverted (an
     inverted rotor pushes the craft DOWN; commanding the floor minimizes
     it through the motor lag).
  4. allocation: solve the per-airframe 4x4 mixer (arm torques + reaction
     yaw) for per-rotor thrusts, clip to the feasible thrust range,
     invert the quadratic thrust curve back to normalized commands.

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
from raptor_tpu.env.dynamics import rotor_thrusts
from raptor_tpu.env.maths import quat_to_rotm
from raptor_tpu.env.types import DynamicsParams, InitConfig, State


def controller(
    params: DynamicsParams,
    state: State,
    k_theta: float = 8.0,
    w_cap: float = 10.0,
    k_w: float = 30.0,
    kp_p: float = 7.0,
    kd_p: float = 4.5,
    tilt_gate: float = 1.2,  # rad: above this, target pure upright
) -> jnp.ndarray:
    """One action [4] in [-1,1] from privileged state (single env)."""
    R = quat_to_rotm(state.orientation)  # body -> world
    z_b = R[:, 2]
    z_w = jnp.array([0.0, 0.0, 1.0], jnp.float32)

    # desired acceleration (world) for the hover phase
    g = 9.81
    a_des = kp_p * (-state.position) + kd_p * (-state.linear_velocity)
    a_des = a_des + jnp.array([0.0, 0.0, g], jnp.float32)
    a_dir = a_des / jnp.maximum(jnp.linalg.norm(a_des), 1e-6)

    tilt = jnp.arccos(jnp.clip(jnp.dot(z_b, z_w), -1.0, 1.0))
    z_des = jnp.where(tilt > tilt_gate, z_w, a_dir)
    z_des = z_des / jnp.maximum(jnp.linalg.norm(z_des), 1e-6)

    # attitude error axis/angle (world), then body frame
    cr = jnp.cross(z_b, z_des)
    s = jnp.linalg.norm(cr)
    c = jnp.dot(z_b, z_des)
    theta = jnp.arctan2(s, c)
    # when anti-parallel the cross product vanishes: pick any axis ⊥ z_b
    fallback = jnp.cross(z_b, jnp.array([1.0, 0.0, 0.0], jnp.float32))
    fallback = jnp.where(
        jnp.linalg.norm(fallback) < 1e-3,
        jnp.cross(z_b, jnp.array([0.0, 1.0, 0.0], jnp.float32)),
        fallback,
    )
    axis_w = jnp.where(s > 1e-4, cr / jnp.maximum(s, 1e-6),
                       fallback / jnp.maximum(jnp.linalg.norm(fallback), 1e-6))
    axis_b = R.T @ axis_w

    w_des = axis_b * jnp.minimum(w_cap, k_theta * theta)
    I = params.inertia_diag
    tau = I * (k_w * (w_des - state.angular_velocity)) + jnp.cross(
        state.angular_velocity, I * state.angular_velocity
    )

    # collective thrust: useful component of a_des along body z; while the
    # rotor axis points down, hold the floor (inverted thrust hurts)
    T_total = params.mass * jnp.dot(a_des, z_b)
    t_min = rotor_thrusts(params, params.rpm_min)
    t_max = rotor_thrusts(params, params.rpm_max)
    T_total = jnp.clip(T_total, 4.0 * t_min, 4.0 * t_max)

    # allocation: [T, tau] = A @ t  (t = per-rotor thrusts)
    d = params.rotor_thrust_directions  # [4,3] ~ body +z
    arm = jnp.cross(params.rotor_positions, d)  # [4,3]
    yaw = (params.rotor_torque_signs * params.torque_constant)[:, None] * d
    A = jnp.concatenate(
        [d[:, 2:3].T, (arm + yaw).T], axis=0
    )  # [4 (T,tx,ty,tz), 4 rotors]
    rhs = jnp.concatenate([T_total[None], tau])
    t = jnp.linalg.solve(A + 1e-6 * jnp.eye(4), rhs)
    t = jnp.clip(t, t_min, t_max)

    # invert thrust curve T(u) = c0 + c1 u + c2 u^2 for u in [rpm_min, 1]
    c0, c1, c2 = params.thrust_curve[0], params.thrust_curve[1], params.thrust_curve[2]
    disc = jnp.maximum(c1 * c1 - 4.0 * c2 * (c0 - t), 0.0)
    u = (-c1 + jnp.sqrt(disc)) / (2.0 * c2)
    action = 2.0 * (u - params.rpm_min) / jnp.maximum(
        params.rpm_max - params.rpm_min, 1e-6
    ) - 1.0
    return jnp.clip(action, -1.0, 1.0)


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
