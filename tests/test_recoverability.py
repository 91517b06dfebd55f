"""Recoverability bound: pins the MEASURED reversal of the round-1
hypothesis. The optimistic-recovery bound (differential-torque flip capped
at the angular-velocity termination bound, free-fall during rotation,
max-thrust arrest) shows ~0% of full-attitude starts are geometrically
unrecoverable inside the ±0.6 m box — so observed pi-start terminations
are control difficulty, not physics (see apps/recoverability.py)."""

import jax
import jax.numpy as jnp

from raptor_tpu.apps.recoverability import (
    measure,
    unrecoverable_lower_bound,
)
from raptor_tpu.env import EnvConfig, L2F
from raptor_tpu.env.types import State


def test_bound_near_zero_at_all_angles():
    r = measure(n=512, angles=(0.5, 3.14159265), seed=1)
    gentle, full = r["unrecoverable_lb"]
    # the box does not geometrically doom random starts at ANY angle —
    # the round-1 "half of pi-starts are unrecoverable" hypothesis is false
    assert gentle <= 0.01
    assert full <= 0.05
    assert gentle <= full


def test_inverted_falling_at_floor_is_doomed_upright_is_not():
    env = L2F(EnvConfig())
    p = env.sample_params(jax.random.key(0))

    def mk(q, z, vz):
        return State(
            position=jnp.array([0.0, 0.0, z]),
            orientation=jnp.array(q),
            linear_velocity=jnp.array([0.0, 0.0, vz]),
            angular_velocity=jnp.zeros(3),
            rpm=jnp.full((4,), 0.5),
        )

    # upside down (180° about x), just above the box floor, already
    # falling fast: even the optimistic bound cannot save this
    doomed = unrecoverable_lower_bound(
        env, p, mk([0.0, 1.0, 0.0, 0.0], -0.55, -2.0)
    )
    assert float(doomed) == 1.0
    # upright at the same height and speed arrests within the box
    # (a_up > v^2/(2*0.05) would be needed to fail — check it's safe for
    # a mild descent instead)
    safe = unrecoverable_lower_bound(
        env, p, mk([1.0, 0.0, 0.0, 0.0], -0.3, -0.2)
    )
    assert float(safe) == 0.0
