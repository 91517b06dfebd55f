"""Canonical airframes: crazyflie (27 g) and x500-class (2 kg).

The reference's dynamics distribution spans at least crazyflie <-> x500
(SURVEY §3.3: held-out `crazyflie/*` eval tags, x500 UI model README:68).
Exact l2f parameter files are not in the mount; these presets use public
airframe data (Crazyflie 2.x mass/inertia, X500 dev-kit class) and the
parameterization documented in `types.DynamicsParams`.

Geometry convention: X configuration, FLU body frame, rotor order
[front-right, back-right, back-left, front-left] (reference README:27),
reaction-torque signs alternating around the perimeter (FR=-1, BR=+1,
BL=-1, FL=+1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from raptor_tpu.env.types import DynamicsParams

GRAVITY = 9.81
ROTOR_TORQUE_SIGNS = np.array([-1.0, 1.0, -1.0, 1.0], np.float32)  # FR,BR,BL,FL


def x_config_rotor_positions(arm_length: float) -> np.ndarray:
    """Rotor positions for an X quad with given center-to-rotor distance."""
    l = arm_length / np.sqrt(2.0)
    return np.array(
        [
            [l, -l, 0.0],  # front-right
            [-l, -l, 0.0],  # back-right
            [-l, l, 0.0],  # back-left
            [l, l, 0.0],  # front-left
        ],
        np.float32,
    )


def make_params(
    mass: float,
    arm_length: float,
    inertia_diag=None,
    thrust_to_weight: float = 2.5,
    torque_constant: float = 0.016,
    motor_time_constant: float = 0.05,
    rpm_min: float = 0.1,
    disturbance_force_std: float = 0.0,
    disturbance_torque_std: float = 0.0,
) -> DynamicsParams:
    """Build a DynamicsParams pytree from physical airframe numbers.

    Thrust curve: T(u) = c2 * u^2 with c2 = (thrust_to_weight * m * g) / 4
    so u=1 gives the full-throttle thrust and hover sits at
    u_h = sqrt(1 / thrust_to_weight).
    """
    if inertia_diag is None:
        j_xy = 0.25 * mass * arm_length**2
        inertia_diag = np.array([j_xy, j_xy, 2.0 * j_xy], np.float32)
    inertia_diag = np.asarray(inertia_diag, np.float32)
    c2 = thrust_to_weight * mass * GRAVITY / 4.0
    return DynamicsParams(
        mass=jnp.float32(mass),
        inertia_diag=jnp.asarray(inertia_diag),
        inertia_diag_inv=jnp.asarray(1.0 / inertia_diag),
        rotor_positions=jnp.asarray(x_config_rotor_positions(arm_length)),
        rotor_thrust_directions=jnp.tile(
            jnp.array([0.0, 0.0, 1.0], jnp.float32), (4, 1)
        ),
        rotor_torque_signs=jnp.asarray(ROTOR_TORQUE_SIGNS),
        thrust_curve=jnp.array([0.0, 0.0, c2], jnp.float32),
        torque_constant=jnp.float32(torque_constant),
        rpm_min=jnp.float32(rpm_min),
        rpm_max=jnp.float32(1.0),
        motor_time_constant=jnp.float32(motor_time_constant),
        disturbance_force_std=jnp.float32(disturbance_force_std),
        disturbance_torque_std=jnp.float32(disturbance_torque_std),
    )


def crazyflie() -> DynamicsParams:
    """Bitcraze Crazyflie 2.x (27 g) — the reference's held-out eval airframe."""
    return make_params(
        mass=0.027,
        arm_length=0.046,
        inertia_diag=np.array([1.4e-5, 1.4e-5, 2.17e-5], np.float32),
        thrust_to_weight=1.9,
        torque_constant=0.006,
        motor_time_constant=0.035,
    )


def x500() -> DynamicsParams:
    """X500-class development quad (~2 kg) — the reference UI's 3D model."""
    return make_params(
        mass=2.0,
        arm_length=0.25,
        inertia_diag=np.array([0.02, 0.02, 0.04], np.float32),
        thrust_to_weight=2.6,
        torque_constant=0.016,
        motor_time_constant=0.06,
    )
