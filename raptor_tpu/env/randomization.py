"""Domain randomization: sample airframes spanning crazyflie <-> x500 class.

Mirrors l2f's `sample_initial_parameters` (reference README:60) and the
1,000-airframe JSON generation driven by
`foundation_policy_pre_training_sample_dynamics_parameters` (README:206-207).
Exact upstream ranges are not in the mount (SURVEY §8.1); the ranges here are
chosen to span the documented extremes (27 g crazyflie to 2+ kg X500-class,
SURVEY §1) and live in one dataclass so they can be swapped for upstream
values when parity testing becomes possible.

The sampler is pure JAX (`jax.random`), so `vmap(sample)` materializes an
entire population of airframes on-device as one stacked pytree — this
replaces the reference's JSON-file-per-airframe handoff.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from raptor_tpu.env import presets
from raptor_tpu.env.types import DynamicsParams


@dataclasses.dataclass(frozen=True)
class RandomizationConfig:
    mass_min: float = 0.025  # kg  (crazyflie 0.027)
    mass_max: float = 2.5  # kg  (x500-class ~2.0)
    # arm length scales with mass^(1/3) around the crazyflie anchor, with
    # +-30% log-noise: L = 0.046 * (m/0.027)^(1/3) * noise
    arm_length_rel_std: float = 0.3
    # inertia J_xy = j_factor * m * L^2, J_z = jz_ratio * J_xy
    j_factor_min: float = 0.15
    j_factor_max: float = 0.4
    jz_ratio_min: float = 1.3
    jz_ratio_max: float = 2.2
    thrust_to_weight_min: float = 1.5
    thrust_to_weight_max: float = 4.0
    # reaction-torque/thrust ratio (m): scales roughly with size
    torque_constant_rel_min: float = 0.08  # kappa = rel * arm_length
    torque_constant_rel_max: float = 0.22
    motor_time_constant_min: float = 0.015
    motor_time_constant_max: float = 0.12
    rpm_min_min: float = 0.05
    rpm_min_max: float = 0.25
    # geometry asymmetry: per-rotor position jitter (relative to arm length)
    rotor_position_jitter: float = 0.05
    # per-rotor thrust-axis tilt, radians std
    thrust_axis_tilt_std: float = 0.02
    # mix of linear term in the thrust curve: T = c2*((1-a)*u^2 + a*u)
    thrust_curve_linear_mix_max: float = 0.3
    disturbance_force_std: float = 0.0
    disturbance_torque_std: float = 0.0


def log_uniform(key, minval, maxval):
    return jnp.exp(
        jax.random.uniform(
            key, (), minval=jnp.log(minval), maxval=jnp.log(maxval)
        )
    )


def sample_dynamics_params(
    key: jax.Array, config: RandomizationConfig = RandomizationConfig()
) -> DynamicsParams:
    """Sample one randomized airframe. vmap over keys for a population."""
    keys = jax.random.split(key, 12)
    c = config

    mass = log_uniform(keys[0], c.mass_min, c.mass_max)
    arm = (
        0.046
        * (mass / 0.027) ** (1.0 / 3.0)
        * jnp.exp(jax.random.normal(keys[1], ()) * c.arm_length_rel_std * 0.5)
    )
    j_factor = jax.random.uniform(
        keys[2], (), minval=c.j_factor_min, maxval=c.j_factor_max
    )
    jz_ratio = jax.random.uniform(
        keys[3], (), minval=c.jz_ratio_min, maxval=c.jz_ratio_max
    )
    j_xy = j_factor * mass * arm**2
    inertia = jnp.stack([j_xy, j_xy, jz_ratio * j_xy])

    t2w = jax.random.uniform(
        keys[4], (), minval=c.thrust_to_weight_min, maxval=c.thrust_to_weight_max
    )
    kappa = (
        jax.random.uniform(
            keys[5],
            (),
            minval=c.torque_constant_rel_min,
            maxval=c.torque_constant_rel_max,
        )
        * arm
    )
    t_m = log_uniform(keys[6], c.motor_time_constant_min, c.motor_time_constant_max)
    rpm_min = jax.random.uniform(
        keys[7], (), minval=c.rpm_min_min, maxval=c.rpm_min_max
    )

    # geometry with asymmetry
    base_pos = jnp.asarray(presets.x_config_rotor_positions(1.0)) * arm
    pos_jitter = (
        jax.random.normal(keys[8], (4, 3)) * c.rotor_position_jitter * arm
    )
    rotor_positions = base_pos + pos_jitter

    tilt = jax.random.normal(keys[9], (4, 2)) * c.thrust_axis_tilt_std
    thrust_dirs = jnp.stack(
        [
            jnp.sin(tilt[:, 0]),
            jnp.sin(tilt[:, 1]) * jnp.cos(tilt[:, 0]),
            jnp.cos(tilt[:, 1]) * jnp.cos(tilt[:, 0]),
        ],
        axis=-1,
    )

    # thrust curve: total max thrust = t2w * m * g, mixed quadratic/linear
    a_mix = jax.random.uniform(
        keys[10], (), minval=0.0, maxval=c.thrust_curve_linear_mix_max
    )
    t_max_rotor = t2w * mass * presets.GRAVITY / 4.0
    thrust_curve = jnp.stack(
        [jnp.zeros_like(a_mix), a_mix * t_max_rotor, (1.0 - a_mix) * t_max_rotor]
    )

    return DynamicsParams(
        mass=mass,
        inertia_diag=inertia,
        inertia_diag_inv=1.0 / inertia,
        rotor_positions=rotor_positions,
        rotor_thrust_directions=thrust_dirs,
        rotor_torque_signs=jnp.asarray(presets.ROTOR_TORQUE_SIGNS),
        thrust_curve=thrust_curve,
        torque_constant=kappa,
        rpm_min=rpm_min,
        rpm_max=jnp.float32(1.0),
        motor_time_constant=t_m,
        disturbance_force_std=jnp.float32(c.disturbance_force_std),
        disturbance_torque_std=jnp.float32(c.disturbance_torque_std),
    )


def sample_population(
    key: jax.Array, n: int, config: RandomizationConfig = RandomizationConfig()
) -> DynamicsParams:
    """Sample a stacked population of n airframes (leading [n] axis)."""
    return jax.vmap(lambda k: sample_dynamics_params(k, config))(
        jax.random.split(key, n)
    )
