"""ui-server protocol message builders (offline; the live path needs a
server — reference README:35-37,76-90)."""

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.env import sample_population, ui
from raptor_tpu.env.types import State


def _states(n=3):
    return State(
        position=jnp.zeros((n, 3)),
        orientation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        linear_velocity=jnp.zeros((n, 3)),
        angular_velocity=jnp.zeros((n, 3)),
        rpm=jnp.full((n, 4), 0.5),
    )


def test_ui_message():
    msg = ui.ui_message("ns1", model_url="https://example/x500.glb")
    assert msg["channel"] == "ui_message"
    assert msg["data"]["namespace"] == "ns1"
    assert msg["data"]["model"].endswith(".glb")


def test_parameters_message():
    params = sample_population(jax.random.key(0), 3)
    msg = ui.parameters_message("ns", params, 3)
    assert msg["channel"] == "parameters_message"
    ps = msg["data"]["parameters"]
    assert len(ps) == 3
    assert len(ps[0]["dynamics"]["rotor_positions"]) == 4


def test_state_action_message_shapes():
    msg = ui.state_action_message("ns", _states(3), np.zeros((3, 4)))
    assert msg["channel"] == "state_action_message"
    d = msg["data"]
    assert d["namespace"] == "ns"
    assert len(d["states"]) == 3 and len(d["actions"]) == 3
    s0 = d["states"][0]
    assert len(s0["orientation"]) == 4 and len(s0["rpm"]) == 4
    # JSON-serializable end to end
    import json

    json.dumps(msg)
