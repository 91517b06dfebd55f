"""Pytree types for the l2f-equivalent quadrotor environment.

Reference contract (SURVEY §3.3): state {position, orientation quaternion,
linear velocity (world), angular velocity (body), per-rotor speed}; params
{mass, inertia, rotor geometry, thrust curve, torque coeff, motor time
constant, action/ω limits}. The reference keeps these as C++ structs; here
they are pytrees-of-arrays so a batch of environments is simply the same
pytree with a leading [N] axis (stacked via vmap) — the "VectorState /
VectorParameters struct-of-envs" concept (reference README:51-61) for free.

Unknown-in-mount constants (reward weights, termination bounds, randomization
ranges — SURVEY §8.1) are isolated in the *Config dataclasses below so they
can be swapped when upstream parity testing becomes possible.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

# ---------------------------------------------------------------------------
# dynamic (per-env, traced) pytrees
# ---------------------------------------------------------------------------


class State(struct.PyTreeNode):
    """Quadrotor rigid-body state (one env; engine vmaps a leading [N])."""

    position: jnp.ndarray  # [3] world FLU, m
    orientation: jnp.ndarray  # [4] quaternion (w,x,y,z), body->world
    linear_velocity: jnp.ndarray  # [3] world, m/s
    angular_velocity: jnp.ndarray  # [3] BODY frame, rad/s
    rpm: jnp.ndarray  # [4] rotor speeds, rad/s equivalent units


class DynamicsParams(struct.PyTreeNode):
    """Per-airframe dynamics parameters (one env; vmapped leading [N]).

    thrust_curve maps *normalized rotor speed* u = rpm / rpm_max in [0,1] to
    thrust in Newtons: T(u) = c0 + c1*u + c2*u^2 (polynomial thrust curve,
    SURVEY §3.3 "polynomial thrust curve").
    """

    mass: jnp.ndarray  # [] kg
    inertia_diag: jnp.ndarray  # [3] body-frame diagonal inertia, kg m^2
    inertia_diag_inv: jnp.ndarray  # [3] precomputed inverse
    rotor_positions: jnp.ndarray  # [4,3] body frame, m; order [FR,BR,BL,FL]
    rotor_thrust_directions: jnp.ndarray  # [4,3] unit vectors (≈ +z body)
    rotor_torque_signs: jnp.ndarray  # [4] ±1 reaction-torque sign per rotor
    thrust_curve: jnp.ndarray  # [3] (c0, c1, c2) Newtons over u∈[0,1]
    torque_constant: jnp.ndarray  # [] yaw moment = k * thrust (m)
    rpm_min: jnp.ndarray  # [] normalized floor of rotor speed (>=0)
    rpm_max: jnp.ndarray  # [] normalized ceiling (1.0 by construction)
    motor_time_constant: jnp.ndarray  # [] first-order rotor lag, s
    # disturbances (optional stochastic forces; zero scale = deterministic
    # step, the parity mode of SURVEY §8.2b)
    disturbance_force_std: jnp.ndarray  # [] N, world-frame white force noise
    disturbance_torque_std: jnp.ndarray  # [] N m, body-frame torque noise


# ---------------------------------------------------------------------------
# static (python-time) configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    """Weighted quadratic state/action penalties + survival (SURVEY §3.3).

    Exact reference constants are not recoverable from the mount (SURVEY
    §8.1); these defaults are calibrated so a hovering policy earns ~1.24 /
    step average (reference eval return ≈620 over 500 steps, §6.2).
    """

    scale: float = 1.0
    constant: float = 1.5  # survival bonus per step
    position_weight: float = 1.0
    orientation_weight: float = 0.1
    linear_velocity_weight: float = 0.05
    angular_velocity_weight: float = 0.005
    action_weight: float = 0.1  # penalizes deviation from hover command
    termination_penalty: float = 0.0


@dataclasses.dataclass(frozen=True)
class TerminationConfig:
    """Termination on state bounds (SURVEY §3.3); reference share_terminated
    ≈4-5% at convergence — bounds sized accordingly."""

    position_bound: float = 0.6  # m, per-axis |p_i|
    linear_velocity_bound: float = 1000.0  # m/s (effectively off)
    angular_velocity_bound: float = 35.0  # rad/s


@dataclasses.dataclass(frozen=True)
class InitConfig:
    """sample_initial_state ranges (reference README:61)."""

    position_range: float = 0.3  # m, uniform box half-width
    max_angle: float = 3.14159265  # rad, uniform random attitude up to this
    # Severity shaping of the attitude draw: angle = max_angle * u^(1/p)
    # for u ~ U(0,1]. p = 1.0 is the uniform reference distribution;
    # p > 1 oversamples severe (near-max_angle) starts — e.g. p = 3 puts
    # ~50% of starts above 0.8*max_angle vs 20% for uniform. Used by the
    # round-4 full-attitude curriculum (VERDICT r3 weak #2): uniform-to-pi
    # training leaves pi-starts rare in the replay/DAgger data because
    # they both occur rarely AND terminate early.
    angle_power: float = 1.0
    linear_velocity_std: float = 0.1  # m/s
    angular_velocity_std: float = 0.1  # rad/s
    rpm_at_hover: bool = True  # start rotors near hover speed


def eval_parity_init() -> InitConfig:
    """The measured eval-parity initial-state distribution (VERDICT r1 #3).

    Calibrated empirically with `apps/eval_parity.py`: the SHIPPED reference
    policy replayed on our simulator reproduces its own logged final eval
    stats (482.8/500 episode length, 4.2% terminated — BASELINE.md rows
    23-24) at max_angle=1.0 (measured: 482.9/500, 4.3% across 32 random
    airframes x 8 episodes; artifacts/eval_parity_sweep.json). Our default
    training InitConfig samples attitudes up to pi, which no policy can
    always recover from — use THIS config whenever comparing `evaluation/*`
    numbers against the reference tfevents.
    """
    return InitConfig(max_angle=1.0)


@dataclasses.dataclass(frozen=True)
class ObservationConfig:
    """Observation assembly (reference ckpt.h5::actor@meta):
    Position(3) . OrientationRotationMatrix(9) . LinearVelocity(3) .
    AngularVelocityDelayed(0)(3) . ActionHistory(1)(4) = 22 policy dims,
    followed by a privileged tail (normalized dynamics params) for critics —
    'policy obs = first 22 dims of a larger privileged obs' (SURVEY §3.3).
    """

    action_history_length: int = 1
    angular_velocity_delay: int = 0  # AngularVelocityDelayed(d)
    privileged: bool = True  # append normalized params tail


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    dt: float = 0.01  # control interval, 100 Hz (README:25,147)
    integrator: str = "rk4"  # "rk4" | "euler"
    episode_length: int = 500  # steps (ckpt.h:62)
    reward: RewardConfig = dataclasses.field(default_factory=RewardConfig)
    termination: TerminationConfig = dataclasses.field(
        default_factory=TerminationConfig
    )
    init: InitConfig = dataclasses.field(default_factory=InitConfig)
    observation: ObservationConfig = dataclasses.field(
        default_factory=ObservationConfig
    )


POLICY_OBS_DIM = 22
PRIVILEGED_TAIL_DIM = 9  # normalized log-mass, J, thrust/weight, kappa, T_m...


def observation_dim(config: EnvConfig) -> int:
    base = 18 + 4 * config.observation.action_history_length
    return base + (PRIVILEGED_TAIL_DIM if config.observation.privileged else 0)
