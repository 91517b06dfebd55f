"""l2f-compatible Python API shim.

Mirrors the `l2f` / `l2f.vector8` pip-package surface (reference
README:44-101, SURVEY §A.3) so reference user code ports with renamed
imports only:

    from raptor_tpu.env import l2f_compat as l2f
    vector = l2f.vector8                      # or l2f.vector(N)

    device = l2f.Device()
    rng = vector.VectorRng()
    env = vector.VectorEnvironment()
    params = vector.VectorParameters()
    state, next_state = vector.VectorState(), vector.VectorState()
    obs = np.zeros((env.N_ENVIRONMENTS, env.OBSERVATION_DIM), np.float32)

    l2f.initialize_rng(device, rng, seed)
    l2f.initialize_environment(device, env)
    l2f.sample_initial_parameters(device, env, params, rng)
    l2f.sample_initial_state(device, env, params, state, rng)
    l2f.observe(device, env, params, state, obs, rng)
    dts = l2f.step(device, env, params, state, action, next_state, rng)
    state.assign(next_state)

Under the hood everything is the vectorized JAX engine; the mutable-looking
objects are thin containers over stacked pytrees. `vector8` fixes
N_ENVIRONMENTS=8 like the reference wheel; `vector(N)` generalizes.
"""

from __future__ import annotations

import types
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.env.quad import L2F
from raptor_tpu.env.randomization import sample_dynamics_params
from raptor_tpu.env.types import EnvConfig


class Device:
    """Device tag (the reference's rlt device concept); selects the jax
    default backend."""

    def __init__(self, platform: Optional[str] = None):
        self.platform = platform


class _StateView:
    """Attribute view of one env's state (reference `.states[i].position`)."""

    def __init__(self, parent, i):
        self._parent, self._i = parent, i

    @property
    def position(self):
        return np.asarray(self._parent.dynamics.position[self._i])

    @property
    def orientation(self):
        return np.asarray(self._parent.dynamics.orientation[self._i])

    @property
    def linear_velocity(self):
        return np.asarray(self._parent.dynamics.linear_velocity[self._i])

    @property
    def angular_velocity(self):
        return np.asarray(self._parent.dynamics.angular_velocity[self._i])

    @property
    def rpm(self):
        return np.asarray(self._parent.dynamics.rpm[self._i])


def _make_vector_module(n_environments: int, config: EnvConfig = EnvConfig()):
    env_impl = L2F(config)
    mod = types.SimpleNamespace()
    mod.N_ENVIRONMENTS = n_environments

    class VectorRng:
        def __init__(self):
            self.key = jax.random.key(0)

        def split(self):
            self.key, sub = jax.random.split(self.key)
            return sub

    class VectorEnvironment:
        N_ENVIRONMENTS = n_environments
        OBSERVATION_DIM = env_impl.OBSERVATION_DIM
        ACTION_DIM = env_impl.ACTION_DIM
        EPISODE_LENGTH = env_impl.EPISODE_LENGTH

        def __init__(self):
            self.impl = env_impl

    class VectorParameters:
        def __init__(self):
            self.stacked = None

        def assign(self, other: "VectorParameters"):
            self.stacked = other.stacked

    class VectorState:
        """Carries the dynamics pytree plus the observation histories the
        configured obs spec needs (quad.EnvState semantics: oldest-first
        ActionHistory(h) and AngularVelocityDelayed(d) rings)."""

        def __init__(self):
            h = config.observation.action_history_length
            d = config.observation.angular_velocity_delay
            self.dynamics = None
            self.action_history = jnp.zeros(
                (n_environments, h, 4), jnp.float32
            )
            self.angvel_history = jnp.zeros(
                (n_environments, d + 1, 3), jnp.float32
            )

        @property
        def prev_action(self):
            return self.action_history[:, -1]

        @property
        def states(self):
            return [_StateView(self, i) for i in range(n_environments)]

        def assign(self, other: "VectorState"):
            self.dynamics = other.dynamics
            self.action_history = other.action_history
            self.angvel_history = other.angvel_history

    mod.VectorRng = VectorRng
    mod.VectorEnvironment = VectorEnvironment
    mod.VectorParameters = VectorParameters
    mod.VectorState = VectorState
    mod._env_impl = env_impl
    return mod


vector8 = _make_vector_module(8)


def vector(n_environments: int, config: EnvConfig = EnvConfig()):
    return _make_vector_module(n_environments, config)


# -- free functions (reference README:58-61,94-99) --------------------------


def initialize_rng(device: Device, rng, seed: int):
    rng.key = jax.random.key(seed)


def initialize_environment(device: Device, env):
    pass  # the JAX engine is stateless; construction happened in the module


def sample_initial_parameters(device: Device, env, params, rng):
    n = env.N_ENVIRONMENTS
    keys = jax.random.split(rng.split(), n)
    params.stacked = jax.vmap(sample_dynamics_params)(keys)


def sample_initial_state(device: Device, env, params, state, rng):
    n = env.N_ENVIRONMENTS
    cfg = env.impl.config.observation
    keys = jax.random.split(rng.split(), n)
    state.dynamics = jax.vmap(env.impl.sample_state)(keys, params.stacked)
    state.action_history = jnp.zeros(
        (n, cfg.action_history_length, 4), jnp.float32
    )
    # pre-fill the delay ring with the true initial angvel (quad.reset:218)
    state.angvel_history = jnp.broadcast_to(
        state.dynamics.angular_velocity[:, None, :],
        (n, cfg.angular_velocity_delay + 1, 3),
    )


def observe(device: Device, env, params, state, observation: np.ndarray, rng):
    obs = jax.vmap(env.impl.observe, in_axes=(0, 0, 0, None, 0))(
        params.stacked, state.dynamics, state.action_history, None,
        state.angvel_history,
    )
    observation[...] = np.asarray(obs)


def step(device: Device, env, params, state, action, next_state, rng):
    """Advance dynamics; returns per-env dts (reference README:96).

    Maintains the observation history rings exactly like quad.step:278-282
    (shift, append newest)."""
    n = env.N_ENVIRONMENTS
    keys = jax.random.split(rng.split(), n)
    # clip BEFORE integrating and recording, exactly like quad.step:267 —
    # the history ring must hold the executed (clipped) action
    a = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
    nxt, dts = jax.vmap(env.impl.dynamics_step)(
        params.stacked, state.dynamics, a, keys
    )
    next_state.dynamics = nxt
    next_state.action_history = jnp.concatenate(
        [state.action_history[:, 1:], a[:, None]], axis=1
    )
    next_state.angvel_history = jnp.concatenate(
        [state.angvel_history[:, 1:], nxt.angular_velocity[:, None]], axis=1
    )
    return np.asarray(dts)


# -- UI message builders (reference README:76-90 naming, SURVEY §A.3) -------


class UI:
    """UI handle: carries the namespace from the ui-server handshake."""

    def __init__(self, namespace: str = "default"):
        self.ns = namespace


def set_ui_message(device: Device, env, ui: "UI", model_url=None) -> str:
    """Returns the JSON ui_message payload (send over the websocket)."""
    import json

    from raptor_tpu.env import ui as ui_mod

    return json.dumps(ui_mod.ui_message(ui.ns, model_url))


def set_parameters_message(device: Device, env, params, ui: "UI") -> str:
    import json

    from raptor_tpu.env import ui as ui_mod

    return json.dumps(
        ui_mod.parameters_message(ui.ns, params.stacked, env.N_ENVIRONMENTS)
    )


def set_state_action_message(device: Device, env, params, ui: "UI", state, action) -> str:
    import json

    from raptor_tpu.env import ui as ui_mod

    return json.dumps(
        ui_mod.state_action_message(ui.ns, state.dynamics, np.asarray(action))
    )
