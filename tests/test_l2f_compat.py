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
