"""ui-server websocket client: 3D visualization protocol.

Speaks the reference `ui-server` protocol (SURVEY §3.3; reference
README:35-37,63-90): connect to ws://host:13337/backend, receive a handshake
carrying a namespace, then send JSON channels:

    {"channel": "ui_message",           "data": {...ui spec/model override...}}
    {"channel": "parameters_message",   "data": {"namespace": ns, "parameters": [...]}}
    {"channel": "state_action_message", "data": {"namespace": ns, "states": [...], "actions": [...]}}

Message builders are pure functions (testable offline); `UIClient` drives a
live server when one is reachable (`pip install ui-server` on a networked
machine, README:33-37).
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np

DEFAULT_URL = "ws://localhost:13337/backend"


def ui_message(namespace: str, model_url: Optional[str] = None) -> dict:
    """UI setup; model_url optionally overrides the 3D model (reference
    README:63-70 uses an x500 GLB)."""
    data: dict = {"namespace": namespace}
    if model_url is not None:
        data["model"] = model_url
    return {"channel": "ui_message", "data": data}


def parameters_message(namespace: str, params_stacked, n_envs: int) -> dict:
    """Per-env airframe parameters for render scaling."""
    from raptor_tpu.env.io import params_to_dict
    import jax

    parameters = []
    for i in range(n_envs):
        p_i = jax.tree.map(lambda x: np.asarray(x)[i], params_stacked)
        d = params_to_dict(p_i)
        parameters.append(
            {
                "dynamics": {
                    "mass": d["mass"],
                    "rotor_positions": d["rotor_positions"],
                    "rotor_thrust_directions": d["rotor_thrust_directions"],
                }
            }
        )
    return {
        "channel": "parameters_message",
        "data": {"namespace": namespace, "parameters": parameters},
    }


def state_action_message(
    namespace: str, states, actions: Sequence[Sequence[float]]
) -> dict:
    """Per-step state+action frame. `states` is the stacked dynamics State
    pytree; actions [N, 4]."""
    n = np.asarray(states.position).shape[0]
    payload = []
    actions = np.asarray(actions)
    for i in range(n):
        payload.append(
            {
                "state": {
                    "position": np.asarray(states.position)[i].tolist(),
                    "orientation": np.asarray(states.orientation)[i].tolist(),
                    "linear_velocity": np.asarray(states.linear_velocity)[i].tolist(),
                    "angular_velocity": np.asarray(states.angular_velocity)[i].tolist(),
                    "rpm": np.asarray(states.rpm)[i].tolist(),
                },
                "action": actions[i].tolist(),
            }
        )
    return {
        "channel": "state_action_message",
        "data": {"namespace": namespace, "states": [p["state"] for p in payload],
                 "actions": [p["action"] for p in payload]},
    }


class UIClient:
    """Async client for a live ui-server (mirror of README:79-104 usage):

        async with UIClient() as ui:
            await ui.set_parameters(params, n_envs=8)
            await ui.render(states, actions)
    """

    def __init__(self, url: str = DEFAULT_URL):
        self.url = url
        self.namespace: Optional[str] = None
        self._ws = None

    async def __aenter__(self):
        import websockets

        self._ws = await websockets.connect(self.url)
        handshake = json.loads(await self._ws.recv())
        self.namespace = handshake.get("data", {}).get("namespace", "default")
        return self

    async def __aexit__(self, *exc):
        if self._ws is not None:
            await self._ws.close()

    async def send(self, message: dict):
        await self._ws.send(json.dumps(message))

    async def set_ui(self, model_url: Optional[str] = None):
        await self.send(ui_message(self.namespace, model_url))

    async def set_parameters(self, params_stacked, n_envs: int):
        await self.send(parameters_message(self.namespace, params_stacked, n_envs))

    async def render(self, states, actions):
        await self.send(state_action_message(self.namespace, states, actions))
