"""Rigid-body quadrotor dynamics: rotor lag ODE + Newton-Euler + quaternion
kinematics, RK4 integration at dt=0.01 s.

Reference contract (SURVEY §3.3 "l2f dynamics core"): forces = gravity +
rotor thrusts (polynomial thrust curve), yaw reaction torque, first-order
rotor lag, RK4. All functions are single-env pure JAX; the engine `vmap`s a
leading env axis and XLA fuses the whole RK4 into one elementwise kernel —
no per-step host boundary (contrast with reference §4.2 where obs/action
cross Python<->C++ each step).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from raptor_tpu.env import maths
from raptor_tpu.env.types import DynamicsParams, State

GRAVITY_VEC = jnp.array([0.0, 0.0, -9.81], jnp.float32)


def action_to_rpm_setpoint(params: DynamicsParams, action: jnp.ndarray) -> jnp.ndarray:
    """Normalized motor command a in [-1,1] -> normalized rotor-speed setpoint
    in [rpm_min, rpm_max] (reference README:27 motor-command contract)."""
    a = jnp.clip(action, -1.0, 1.0)
    return params.rpm_min + (a + 1.0) * 0.5 * (params.rpm_max - params.rpm_min)


def rotor_thrusts(params: DynamicsParams, rpm: jnp.ndarray) -> jnp.ndarray:
    """Per-rotor thrust [N] from normalized rotor speed u via the polynomial
    thrust curve T(u) = c0 + c1*u + c2*u^2."""
    c = params.thrust_curve
    return c[0] + c[1] * rpm + c[2] * rpm * rpm


def derivative(
    params: DynamicsParams,
    state: State,
    rpm_setpoint: jnp.ndarray,
    ext_force_world: jnp.ndarray,
    ext_torque_body: jnp.ndarray,
) -> State:
    """Time derivative of the full state (one env).

    ext_force_world / ext_torque_body carry the (optional) per-control-step
    disturbance samples; zero in the deterministic parity mode (SURVEY §8.2b).
    """
    thrust = rotor_thrusts(params, state.rpm)  # [4]
    # body-frame net rotor force and torque
    f_rotors = thrust[:, None] * params.rotor_thrust_directions  # [4,3]
    force_body = jnp.sum(f_rotors, axis=0)
    tau_arms = jnp.sum(jnp.cross(params.rotor_positions, f_rotors), axis=0)
    tau_reaction = jnp.sum(
        (params.rotor_torque_signs * params.torque_constant * thrust)[:, None]
        * params.rotor_thrust_directions,
        axis=0,
    )
    torque_body = tau_arms + tau_reaction + ext_torque_body

    # Newton (world frame)
    dv = (
        maths.quat_rotate(state.orientation, force_body) + ext_force_world
    ) / params.mass + GRAVITY_VEC

    # Euler (body frame, diagonal inertia)
    j, j_inv = params.inertia_diag, params.inertia_diag_inv
    w = state.angular_velocity
    dw = j_inv * (torque_body - jnp.cross(w, j * w))

    return State(
        position=state.linear_velocity,
        orientation=maths.quat_derivative(state.orientation, w),
        linear_velocity=dv,
        angular_velocity=dw,
        rpm=(rpm_setpoint - state.rpm) / params.motor_time_constant,
    )


def _axpy(state: State, d: State, h) -> State:
    """state + h * d, leafwise (keeps RK4 readable and fuseable)."""
    import jax

    return jax.tree.map(lambda s, ds: s + h * ds, state, d)


def integrate(
    params: DynamicsParams,
    state: State,
    rpm_setpoint: jnp.ndarray,
    dt: float,
    ext_force_world: jnp.ndarray,
    ext_torque_body: jnp.ndarray,
    method: str = "rk4",
) -> State:
    """One integration step; quaternion renormalized and rotor speed clipped
    to its physical range afterwards."""

    def f(s: State) -> State:
        return derivative(params, s, rpm_setpoint, ext_force_world, ext_torque_body)

    if method == "euler":
        nxt = _axpy(state, f(state), dt)
    else:  # rk4
        k1 = f(state)
        k2 = f(_axpy(state, k1, dt * 0.5))
        k3 = f(_axpy(state, k2, dt * 0.5))
        k4 = f(_axpy(state, k3, dt))
        import jax

        nxt = jax.tree.map(
            lambda s, a, b, c, d: s + (dt / 6.0) * (a + 2.0 * b + 2.0 * c + d),
            state,
            k1,
            k2,
            k3,
            k4,
        )
    return nxt.replace(
        orientation=maths.quat_normalize(nxt.orientation),
        rpm=jnp.clip(nxt.rpm, 0.0, params.rpm_max),
    )


def hover_rpm(params: DynamicsParams) -> jnp.ndarray:
    """Normalized rotor speed at hover: solves T(u) = m g / 4 for the
    (monotone) polynomial thrust curve via the quadratic formula."""
    c0, c1, c2 = params.thrust_curve[0], params.thrust_curve[1], params.thrust_curve[2]
    target = params.mass * 9.81 / 4.0 - c0
    # c2 u^2 + c1 u - target = 0, taking the positive root; guard c2 ~ 0
    c2_safe = jnp.where(jnp.abs(c2) < 1e-8, 1e-8, c2)
    disc = jnp.sqrt(jnp.maximum(c1 * c1 + 4.0 * c2_safe * target, 0.0))
    u_quad = (-c1 + disc) / (2.0 * c2_safe)
    u_lin = target / jnp.where(jnp.abs(c1) < 1e-8, 1e-8, c1)
    u = jnp.where(jnp.abs(c2) < 1e-8, u_lin, u_quad)
    return jnp.clip(u, 0.0, 1.0)


def hover_action(params: DynamicsParams) -> jnp.ndarray:
    """Normalized motor command that holds hover (inverse of
    action_to_rpm_setpoint at hover_rpm)."""
    u = hover_rpm(params)
    span = jnp.maximum(params.rpm_max - params.rpm_min, 1e-6)
    return jnp.clip(2.0 * (u - params.rpm_min) / span - 1.0, -1.0, 1.0)


def sub_step(
    params: DynamicsParams,
    state: State,
    action: jnp.ndarray,
    dt: float,
    ext_force_world: jnp.ndarray | None = None,
    ext_torque_body: jnp.ndarray | None = None,
    method: str = "rk4",
) -> Tuple[State, jnp.ndarray]:
    """Dynamics-only control step (no reward/termination): returns
    (next_state, dt) — the shape of l2f's `step(...) -> dts` (README:96)."""
    if ext_force_world is None:
        ext_force_world = jnp.zeros(3, jnp.float32)
    if ext_torque_body is None:
        ext_torque_body = jnp.zeros(3, jnp.float32)
    setpoint = action_to_rpm_setpoint(params, action)
    nxt = integrate(
        params, state, setpoint, dt, ext_force_world, ext_torque_body, method
    )
    return nxt, jnp.float32(dt)
