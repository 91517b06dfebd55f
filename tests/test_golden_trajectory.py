"""Frozen golden-trajectory regression for the dynamics core.

Determinism tests catch run-to-run divergence; this catches SILENT physics
changes across refactors (the reference's analog is its golden example-I/O
discipline, SURVEY §5.1.1, applied here to the simulator itself). The
frozen trajectory was generated from the crazyflie preset with a fixed
reset key and action sequence (artifacts/golden_trajectory.npz). If a
deliberate physics change invalidates it, regenerate the artifact in the
same commit and say why — `tests/test_sim_policy_crossval.py` must still
pass (the shipped reference policy must still fly the new physics)."""

import numpy as np
import jax
import jax.numpy as jnp

from raptor_tpu.env import EnvConfig, L2F, presets


def test_dynamics_match_frozen_golden_trajectory():
    data = np.load("artifacts/golden_trajectory.npz")
    env = L2F(EnvConfig())
    params = presets.crazyflie()
    es, _ = env.reset(jax.random.key(int(data["init_key"])), params)
    state = es.dynamics
    rows = []
    for t in range(data["actions"].shape[0]):
        state, _ = env.dynamics_step(params, state, jnp.asarray(data["actions"][t]))
        rows.append(
            np.concatenate(
                [np.asarray(state.position), np.asarray(state.orientation),
                 np.asarray(state.linear_velocity),
                 np.asarray(state.angular_velocity), np.asarray(state.rpm)]
            )
        )
    np.testing.assert_allclose(
        np.stack(rows), data["trajectory"], atol=1e-5,
        err_msg="dynamics diverged from the frozen golden trajectory — "
        "if this is an intended physics change, regenerate "
        "artifacts/golden_trajectory.npz in this commit",
    )
