"""The reference README's user loop (README:94-101) against the compat shim:
vector8 envs + the shipped Raptor policy, 500 steps — BASELINE config 0."""

import numpy as np

from raptor_tpu.env import l2f_compat as l2f
from raptor_tpu.policy import Raptor


def test_vector8_readme_loop():
    device = l2f.Device()
    vector = l2f.vector8
    rng = vector.VectorRng()
    env = vector.VectorEnvironment()
    params = vector.VectorParameters()
    state, next_state = vector.VectorState(), vector.VectorState()

    assert env.N_ENVIRONMENTS == 8
    assert env.OBSERVATION_DIM > 22  # privileged tail beyond the policy obs

    l2f.initialize_rng(device, rng, seed=0)
    l2f.initialize_environment(device, env)
    l2f.sample_initial_parameters(device, env, params, rng)
    l2f.sample_initial_state(device, env, params, state, rng)

    policy = Raptor(batch_size=8)
    policy.reset()
    obs = np.zeros((8, env.OBSERVATION_DIM), np.float32)

    positions = []
    for _ in range(100):
        l2f.observe(device, env, params, state, obs, rng)
        action = policy.evaluate_step(obs[:, :22])  # README:97 slice
        dts = l2f.step(device, env, params, state, action, next_state, rng)
        assert dts.shape == (8,)
        np.testing.assert_allclose(dts, 0.01)
        state.assign(next_state)
        positions.append(state.states[0].position.copy())

    assert np.all(np.isfinite(np.stack(positions)))
    assert np.all(np.isfinite(obs))
    # state views expose the reference attribute surface
    s0 = state.states[0]
    assert s0.orientation.shape == (4,)
    assert s0.rpm.shape == (4,)


def test_ui_message_functions():
    """The reference's UI function names (SURVEY §A.3) on the compat shim."""
    import json

    device = l2f.Device()
    vector = l2f.vector8
    rng = vector.VectorRng()
    env = vector.VectorEnvironment()
    params = vector.VectorParameters()
    state = vector.VectorState()
    l2f.initialize_rng(device, rng, 0)
    l2f.sample_initial_parameters(device, env, params, rng)
    l2f.sample_initial_state(device, env, params, state, rng)

    ui = l2f.UI("ns-42")
    m1 = json.loads(l2f.set_ui_message(device, env, ui))
    assert m1["channel"] == "ui_message" and m1["data"]["namespace"] == "ns-42"
    m2 = json.loads(l2f.set_parameters_message(device, env, params, ui))
    assert len(m2["data"]["parameters"]) == 8
    m3 = json.loads(
        l2f.set_state_action_message(device, env, params, ui, state,
                                     np.zeros((8, 4)))
    )
    assert len(m3["data"]["states"]) == 8


def test_history_observation_config():
    """h>1 / d>0 obs specs through the compat shim (VERDICT r1 weak #7):
    ActionHistory(h) and AngularVelocityDelayed(d) rings are maintained
    with quad.step semantics (shift + append, oldest first)."""
    from raptor_tpu.env.types import EnvConfig, ObservationConfig

    cfg = EnvConfig(
        observation=ObservationConfig(
            action_history_length=3, angular_velocity_delay=2
        )
    )
    device = l2f.Device()
    vector = l2f.vector(4, cfg)
    rng = vector.VectorRng()
    env = vector.VectorEnvironment()
    params = vector.VectorParameters()
    state, next_state = vector.VectorState(), vector.VectorState()
    assert env.OBSERVATION_DIM == 18 + 4 * 3 + 9  # privileged tail
    obs = np.zeros((4, env.OBSERVATION_DIM), np.float32)

    l2f.initialize_rng(device, rng, 7)
    l2f.sample_initial_parameters(device, env, params, rng)
    l2f.sample_initial_state(device, env, params, state, rng)
    l2f.observe(device, env, params, state, obs, rng)
    assert np.all(np.isfinite(obs))
    # fresh episode: all 3 history slots are zero-actions
    np.testing.assert_allclose(obs[:, 18:30], 0.0)
    # delayed angvel ring is pre-filled with the initial angvel
    np.testing.assert_allclose(
        obs[:, 15:18], np.asarray(state.dynamics.angular_velocity), atol=1e-6
    )

    actions = [np.full((4, 4), v, np.float32) for v in (0.1, 0.2, 0.3)]
    for a in actions:
        l2f.step(device, env, params, state, a, next_state, rng)
        state.assign(next_state)
    l2f.observe(device, env, params, state, obs, rng)
    # oldest-first action history = the three actions in order
    np.testing.assert_allclose(obs[:, 18:22], 0.1, atol=1e-6)
    np.testing.assert_allclose(obs[:, 22:26], 0.2, atol=1e-6)
    np.testing.assert_allclose(obs[:, 26:30], 0.3, atol=1e-6)
    # d=2 delay: observed angvel is the one from two steps ago (after the
    # first of the three steps)
    np.testing.assert_allclose(
        obs[:, 15:18], np.asarray(state.angvel_history[:, 0]), atol=1e-6
    )
    assert state.prev_action.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(state.prev_action), 0.3, atol=1e-6)
