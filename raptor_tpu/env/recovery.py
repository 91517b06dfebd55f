"""Scripted geometric full-attitude recovery controller (library form).

The round-4 evidence chain (docs/RESULTS.md "the failure mode, measured
exactly"; artifacts/{recoverability_bound,scripted_recovery}.json) proved
the pi-start gap is learnable: every learned policy flips at ~3.4 rad/s
and exits the 0.6 m position box, while this controller — privileged
state, no learning — executes the fast flip-arrest-hover under the FULL
standard dynamics and terminates only 28.5% (aggregate) / 14.5%
(crazyflie) at pi starts vs the best student's ~39%.

It lives here (not only in `apps/scripted_recovery.py`) because it is
also a *demonstrator*: `distill.post_training` can route collect states
above a tilt threshold to it for DAgger labels (demonstration injection,
docs/MIGRATION.md §6 lever 1a — the reference has no analog; its
teachers never see full-attitude starts either, which is why the shipped
policy terminates 55% at pi).

Controller (per step, privileged state):
  1. attitude: rotate body +z onto a target direction — world up while
     tilted, the desired-acceleration direction once near-upright
     (position/velocity PD). Desired body rate = axis * min(w_cap,
     k*theta); w_cap stays well under the 35 rad/s termination bound.
  2. torque = I (k_w (w_des - w)) + w x I w  (rate PD + gyroscopic ff).
  3. collective thrust = m * (a_des . z_b), floored while inverted (an
     inverted rotor pushes the craft DOWN; commanding the floor minimizes
     it through the motor lag).
  4. allocation: solve the per-airframe 4x4 mixer (arm torques + reaction
     yaw) for per-rotor thrusts, clip to the feasible range, invert the
     quadratic thrust curve back to normalized commands.

Gains are the round-4 sweep optimum (w_cap 10 / k_theta 8 / k_w 30;
faster caps HURT — actuator saturation breaks allocation on sluggish
frames).
"""

from __future__ import annotations

import jax.numpy as jnp

from raptor_tpu.env.dynamics import rotor_thrusts
from raptor_tpu.env.maths import quat_to_rotm
from raptor_tpu.env.types import DynamicsParams, State


def tilt_angle(orientation: jnp.ndarray) -> jnp.ndarray:
    """Angle between body +z and world up, from a unit quaternion [4]."""
    R = quat_to_rotm(orientation)
    return jnp.arccos(jnp.clip(R[2, 2], -1.0, 1.0))


def adaptive_gain_caps(
    params: DynamicsParams,
    w_cap: float,
    k_w: float,
    c_flip: float = 1.0,
    c_lag: float = 0.8,
    c_bw: float = 1.5,
):
    """Per-airframe caps on (w_cap, k_w) for the residual-failure tail.

    The round-4 witness's failures are 100% low-TWR (~1.5) slow-motor
    (~100 ms) frames (artifacts/scripted_recovery.json; RESULTS §round 4):
    the fixed gains command rate ramps those airframes cannot track, the
    rotors saturate, and saturated allocation corrupts the collective
    thrust. Three physics-derived caps (MIGRATION §6 lever 3):

    - flip authority: peak rate of a bang-bang flip at angular accel
      alpha is ~sqrt(alpha * theta); cap w at c_flip * sqrt(alpha_max)
      with alpha_max = differential-thrust torque budget / inertia.
    - motor lag, rate cap: arresting from w takes w/alpha seconds of
      reversed torque; a first-order rotor lag T_m delays that reversal,
      so w must stay under ~c_lag / T_m for the arrest to fit.
    - motor lag, loop bandwidth: the rate-PD gain k_w closes a loop
      through the T_m lag; keep k_w under ~c_bw / T_m.

    Nominal (fast-motor, high-TWR) frames are unaffected: their caps sit
    above the fixed sweep-optimal gains."""
    t_min = rotor_thrusts(params, params.rpm_min)
    t_max = rotor_thrusts(params, params.rpm_max)
    d = params.rotor_thrust_directions
    arm = jnp.cross(params.rotor_positions, d)  # [4,3] torque arm / thrust
    dthr = 0.5 * (t_max - t_min)  # max per-rotor thrust deviation from mid
    tau_cap = jnp.sum(jnp.abs(arm[:, :2]), axis=0) * dthr  # [2] roll/pitch
    alpha_max = jnp.min(tau_cap / params.inertia_diag[:2])
    tm = jnp.maximum(params.motor_time_constant, 1e-4)
    w_cap_eff = jnp.minimum(
        jnp.minimum(w_cap, c_flip * jnp.sqrt(alpha_max)), c_lag / tm
    )
    k_w_eff = jnp.minimum(k_w, c_bw / tm)
    return w_cap_eff, k_w_eff


def recovery_action(
    params: DynamicsParams,
    state: State,
    k_theta: float = 8.0,
    w_cap: float = 10.0,
    k_w: float = 30.0,
    kp_p: float = 7.0,
    kd_p: float = 4.5,
    tilt_gate: float = 1.2,  # rad: above this, target pure upright
    adaptive: bool = False,  # per-airframe (w_cap, k_w) caps, see above
    c_flip: float = 1.0,
    c_lag: float = 0.8,
    c_bw: float = 1.5,
) -> jnp.ndarray:
    """One action [4] in [-1,1] from privileged state (single env)."""
    if adaptive:
        w_cap, k_w = adaptive_gain_caps(params, w_cap, k_w, c_flip, c_lag, c_bw)
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
