"""CLI: 3D visualization demo — rolls out a policy and streams frames to a
running ui-server (the reference's websocket visualizer, README:35-37,72-90).

    # on a networked machine: pip install ui-server && ui-server
    python -m raptor_tpu.apps.visualize --shipped --n-envs 8

Degrades gracefully (prints frames as JSON lines) when no server is
reachable, so the rollout/protocol path is testable offline.
"""

from __future__ import annotations

import argparse
import asyncio
import json

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, InitConfig, L2F, presets, ui
from raptor_tpu.policy import network as policy_net


async def run(args):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if args.shipped or not args.checkpoint:
        from raptor_tpu.policy import shipped_checkpoint_path

        args.checkpoint = shipped_checkpoint_path()
    policy = ckpt_h5.load_actor(args.checkpoint)

    env = L2F(EnvConfig(init=InitConfig(max_angle=0.8, position_range=0.25)))
    n = args.n_envs
    if args.airframe == "random":
        from raptor_tpu.env import sample_population

        params = sample_population(jax.random.key(args.seed), n)
    else:
        one = getattr(presets, args.airframe)()
        params = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), one)

    v_reset, _ = env.vector_ops()
    v_dstep = jax.vmap(env.dynamics_step, in_axes=(0, 0, 0, None))
    v_obs = jax.vmap(env.observe, in_axes=(0, 0, 0))
    es, obs = v_reset(jax.random.split(jax.random.key(args.seed + 1), n), params)
    state = es.dynamics
    h = policy_net.initial_hidden(policy, n)
    prev = jnp.zeros((n, 4))

    client = None
    try:
        client = await ui.UIClient(args.url).__aenter__()
        await client.set_ui()
        await client.set_parameters(params, n)
        print(f"connected to {args.url}, namespace={client.namespace}")
    except Exception as e:  # no server — offline mode
        print(f"ui-server unreachable ({type(e).__name__}); printing frames")

    # --record: persist the protocol session (every message that was / would
    # have been sent) as JSON lines — a replayable ui-server session artifact.
    rec = open(args.record, "w") if args.record else None
    ns = client.namespace if client is not None else "offline"
    if rec is not None:
        rec.write(json.dumps(ui.ui_message(ns)) + "\n")
        rec.write(json.dumps(ui.parameters_message(ns, params, n)) + "\n")

    for t in range(args.steps):
        obs = v_obs(params, state, prev)
        h, action = policy_net.apply_step(policy, h, obs[:, :22])
        action = jnp.clip(action, -1.0, 1.0)
        state, _ = v_dstep(params, state, action, None)
        prev = action
        will_print = client is None and t % args.print_every == 0
        msg = None
        if rec is not None or will_print:  # device->host sync only when used
            msg = ui.state_action_message(ns, state, np.asarray(action))
        if rec is not None:
            rec.write(json.dumps(msg) + "\n")
        if client is not None:
            await client.render(state, np.asarray(action))
            await asyncio.sleep(args.dt)
        elif will_print:
            print(json.dumps(msg["data"]["states"][0]))
    if rec is not None:
        rec.close()
        print(f"recorded session -> {args.record}")
    if client is not None:
        await client.__aexit__()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", nargs="?")
    p.add_argument("--shipped", action="store_true")
    p.add_argument("--airframe", choices=["random", "crazyflie", "x500"],
                   default="x500")
    p.add_argument("--n-envs", type=int, default=8)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--url", default=ui.DEFAULT_URL)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--print-every", type=int, default=100)
    p.add_argument("--record", help="write the protocol session as JSON lines")
    args = p.parse_args(argv)
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
