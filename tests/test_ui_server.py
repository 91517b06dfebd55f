"""Standalone ui-server end-to-end: backend handshake + viewer relay +
late-join scene replay + embedded HTTP viewer page (reference README:33-37
`ui-server` pip package counterpart)."""

import asyncio
import json
import urllib.request

import jax
import jax.numpy as jnp

from raptor_tpu.apps.ui_server import UIServer
from raptor_tpu.env import EnvConfig, L2F
from raptor_tpu.env.ui import UIClient


async def _drive():
    srv = await UIServer().start("127.0.0.1", 0)
    port = srv.port
    import websockets

    env = L2F(EnvConfig())
    params = jax.vmap(env.sample_params)(jax.random.split(jax.random.key(0), 2))
    state, _ = jax.vmap(env.reset, in_axes=(0, 0))(
        jax.random.split(jax.random.key(1), 2), params
    )

    # early viewer sees the live relay
    early = await websockets.connect(f"ws://127.0.0.1:{port}/ui")

    async with UIClient(f"ws://127.0.0.1:{port}/backend") as ui:
        assert ui.namespace == "0"  # server-assigned
        await ui.set_ui()
        await ui.set_parameters(params, n_envs=2)
        await ui.render(state.dynamics, jnp.zeros((2, 4)))

        got = [json.loads(await asyncio.wait_for(early.recv(), 5)) for _ in range(3)]
        assert [m["channel"] for m in got] == [
            "ui_message", "parameters_message", "state_action_message",
        ]
        assert all(m["data"]["namespace"] == "0" for m in got)
        assert len(got[2]["data"]["states"]) == 2
        assert len(got[2]["data"]["states"][0]["position"]) == 3

        # late-joining viewer gets the scene replayed (ui + parameters,
        # NOT the transient state frame)
        late = await websockets.connect(f"ws://127.0.0.1:{port}/ui")
        replay = [json.loads(await asyncio.wait_for(late.recv(), 5)) for _ in range(2)]
        assert [m["channel"] for m in replay] == [
            "ui_message", "parameters_message",
        ]
        rot = replay[1]["data"]["parameters"][0]["dynamics"]["rotor_positions"]
        assert len(rot) == 4 and len(rot[0]) == 3

        # the embedded viewer page is served over plain HTTP
        html = await asyncio.to_thread(
            lambda: urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5
            ).read().decode()
        )
        assert "raptor-tpu ui-server" in html and "/ui" in html

    # backend disconnect -> viewers are told the namespace closed
    closed = json.loads(await asyncio.wait_for(early.recv(), 5))
    assert closed == {"channel": "namespace_closed", "data": {"namespace": "0"}}

    await early.close()
    await late.close()
    await srv.stop()


def test_ui_server_end_to_end():
    asyncio.run(_drive())


def test_backend_requested_namespace_and_bad_json():
    async def drive():
        srv = await UIServer().start("127.0.0.1", 0)
        import websockets

        ws = await websockets.connect(
            f"ws://127.0.0.1:{srv.port}/backend/swarm1"
        )
        hs = json.loads(await asyncio.wait_for(ws.recv(), 5))
        assert hs["data"]["namespace"] == "swarm1"  # path-requested ns
        viewer = await websockets.connect(f"ws://127.0.0.1:{srv.port}/ui")
        await ws.send("{not json")  # must not kill the stream
        await ws.send(json.dumps({"channel": "ui_message", "data": {}}))
        m = json.loads(await asyncio.wait_for(viewer.recv(), 5))
        assert m["channel"] == "ui_message"
        assert m["data"]["namespace"] == "swarm1"  # server fills the ns in
        await ws.close()
        await viewer.close()
        await srv.stop()

    asyncio.run(drive())
