"""Dynamics-parameter JSON serialization.

The reference samples 1,000 airframes into `dynamics_parameters/{i}.json`
consumed by the pre-training binary (README:206-207, nlohmann/json in C++).
Same contract here: one JSON object per airframe, round-trippable to the
DynamicsParams pytree.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from raptor_tpu.env.types import DynamicsParams

_FIELDS = [
    "mass",
    "inertia_diag",
    "inertia_diag_inv",
    "rotor_positions",
    "rotor_thrust_directions",
    "rotor_torque_signs",
    "thrust_curve",
    "torque_constant",
    "rpm_min",
    "rpm_max",
    "motor_time_constant",
    "disturbance_force_std",
    "disturbance_torque_std",
]


def params_to_dict(params: DynamicsParams) -> dict:
    return {f: np.asarray(getattr(params, f)).tolist() for f in _FIELDS}


def params_from_dict(d: dict) -> DynamicsParams:
    return DynamicsParams(
        **{f: jnp.asarray(np.asarray(d[f], np.float32)) for f in _FIELDS}
    )


def save_params_json(path: str, params: DynamicsParams) -> None:
    with open(path, "w") as f:
        json.dump(params_to_dict(params), f, indent=2)


def load_params_json(path: str) -> DynamicsParams:
    with open(path) as f:
        return params_from_dict(json.load(f))
