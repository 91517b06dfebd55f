"""L2F — the TPU-native quadrotor environment.

Functional mirror of l2f's device-style free-function API (SURVEY §3.3/§A.3:
`sample_initial_parameters`, `sample_initial_state`, `observe`, `step`, ...)
as pure single-env functions designed for `jax.vmap`:

    env = L2F(EnvConfig())
    params = env.sample_params(key)                  # one airframe
    es, obs = env.reset(key, params)                 # episode begin
    es, obs, reward, done, info = env.step(params, es, action)  # auto-resets

Batching: `jax.vmap(env.step, in_axes=(0, 0, 0))` etc. — params carry a
leading [N] axis for per-env domain randomization (the reference's
VectorState/VectorParameters concept at arbitrary N). The whole episode
rollout composes into a single `lax.scan` under `jit`.

Observation layout (first 22 dims = the policy observation, ckpt.h5 meta):
    [0:3]   position (world FLU)
    [3:12]  rotation matrix, row-major (body->world)
    [12:15] linear velocity (world)
    [15:18] angular velocity (BODY frame)
    [18:22] previous action
    [22:]   privileged tail (normalized dynamics params; critics only)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from raptor_tpu.env import dynamics, maths, randomization
from raptor_tpu.env.types import (  # noqa: F401
    POLICY_OBS_DIM,
    DynamicsParams,
    EnvConfig,
    State,
    observation_dim,
)


class EnvState(struct.PyTreeNode):
    """Per-env episode state carried by the runner (one env; vmapped).

    Histories implement the reference obs-spec generality (ckpt.h5 meta
    string `...AngularVelocityDelayed(d).ActionHistory(h)`): action_history
    holds the last h actions (oldest first), angvel_history holds d+1
    angular-velocity samples (oldest first; element 0 is the d-step-delayed
    one used in the observation)."""

    dynamics: State
    action_history: jnp.ndarray  # [h, 4] oldest -> newest
    angvel_history: jnp.ndarray  # [d+1, 3] oldest -> newest
    t: jnp.ndarray  # [] int32 steps since episode start
    key: jax.Array  # per-env RNG stream

    @property
    def prev_action(self) -> jnp.ndarray:
        """[4] most recent normalized motor command."""
        return self.action_history[-1]


class L2F:
    """The environment. Static config lives on the object (hashable at trace
    time); all dynamic data flows through pytree arguments."""

    def __init__(self, config: EnvConfig = EnvConfig()):
        self.config = config

    # -- dims ------------------------------------------------------------
    @property
    def OBSERVATION_DIM(self) -> int:  # noqa: N802  (l2f-compat naming)
        return observation_dim(self.config)

    @property
    def ACTION_DIM(self) -> int:  # noqa: N802
        return 4

    @property
    def EPISODE_LENGTH(self) -> int:  # noqa: N802
        return self.config.episode_length

    # -- sampling --------------------------------------------------------
    def sample_params(
        self,
        key: jax.Array,
        config: randomization.RandomizationConfig = randomization.RandomizationConfig(),
    ) -> DynamicsParams:
        """Domain-randomized airframe (l2f sample_initial_parameters,
        README:60)."""
        return randomization.sample_dynamics_params(key, config)

    def sample_state(self, key: jax.Array, params: DynamicsParams) -> State:
        """Randomized initial state (l2f sample_initial_state, README:61)."""
        c = self.config.init
        k1, k2, k3, k4 = jax.random.split(key, 4)
        position = jax.random.uniform(
            k1, (3,), minval=-c.position_range, maxval=c.position_range
        )
        orientation = maths.random_quaternion(k2, c.max_angle, c.angle_power)
        linear_velocity = jax.random.normal(k3, (3,)) * c.linear_velocity_std
        angular_velocity = jax.random.normal(k4, (3,)) * c.angular_velocity_std
        rpm = (
            jnp.broadcast_to(dynamics.hover_rpm(params), (4,))
            if c.rpm_at_hover
            else jnp.full((4,), params.rpm_min)
        )
        return State(
            position=position,
            orientation=orientation,
            linear_velocity=linear_velocity,
            angular_velocity=angular_velocity,
            rpm=rpm,
        )

    # -- observation -----------------------------------------------------
    def privileged_tail(self, params: DynamicsParams) -> jnp.ndarray:
        """Normalized dynamics parameters appended for critics (9 dims)."""
        t2w = (
            jnp.sum(dynamics.rotor_thrusts(params, jnp.full((4,), params.rpm_max)))
            / (params.mass * 9.81)
        )
        arm = jnp.mean(jnp.linalg.norm(params.rotor_positions, axis=-1))
        return jnp.stack(
            [
                jnp.log(params.mass / 0.25),
                jnp.log(params.inertia_diag[0] / 1e-3),
                jnp.log(params.inertia_diag[2] / 1e-3),
                t2w / 4.0,
                params.torque_constant / 0.05,
                jnp.log(params.motor_time_constant / 0.05),
                params.rpm_min,
                arm / 0.25,
                dynamics.hover_action(params),
            ]
        )

    def observe(
        self,
        params: DynamicsParams,
        state: State,
        action_history: jnp.ndarray,  # [4] (h==1 shorthand) or [h, 4]
        key: Optional[jax.Array] = None,
        angvel_history: Optional[jnp.ndarray] = None,  # [d+1, 3]
    ) -> jnp.ndarray:
        """Assemble the observation vector (policy obs + privileged tail).

        Layout: Position(3) . RotationMatrix(9) . LinearVelocity(3) .
        AngularVelocityDelayed(d)(3) . ActionHistory(h)(4h) [. privileged]
        — the reference meta-string contract (ckpt.h5::actor@meta)."""
        h = self.config.observation.action_history_length
        if action_history.ndim == 1:
            assert h == 1, "pass the full [h,4] history when h > 1"
            action_history = action_history[None]
        angvel = (
            state.angular_velocity
            if angvel_history is None
            else angvel_history[0]
        )
        rotm = maths.quat_to_rotm(state.orientation)
        parts = [
            state.position,
            rotm.reshape(9),
            state.linear_velocity,
            angvel,
            action_history.reshape(-1),
        ]
        if self.config.observation.privileged:
            parts.append(self.privileged_tail(params))
        return jnp.concatenate(parts).astype(jnp.float32)

    # -- reward / termination -------------------------------------------
    def reward(
        self,
        params: DynamicsParams,
        state: State,
        action: jnp.ndarray,
        next_state: State,
    ) -> jnp.ndarray:
        """Weighted quadratic costs + survival constant (SURVEY §3.3;
        constants are best-effort, isolated in RewardConfig — §8.1)."""
        c = self.config.reward
        pos_cost = jnp.sum(next_state.position**2)
        # distance-to-identity attitude cost (includes yaw); ~angle^2/2 small-angle
        orient_cost = 2.0 * (1.0 - jnp.abs(next_state.orientation[0]))
        linvel_cost = jnp.sum(next_state.linear_velocity**2)
        angvel_cost = jnp.sum(next_state.angular_velocity**2)
        action_cost = jnp.sum((action - dynamics.hover_action(params)) ** 2)
        return c.scale * (
            c.constant
            - c.position_weight * pos_cost
            - c.orientation_weight * orient_cost
            - c.linear_velocity_weight * linvel_cost
            - c.angular_velocity_weight * angvel_cost
            - c.action_weight * action_cost
        )

    def terminated(self, params: DynamicsParams, state: State) -> jnp.ndarray:
        c = self.config.termination
        return (
            jnp.any(jnp.abs(state.position) > c.position_bound)
            | (jnp.sum(state.linear_velocity**2) > c.linear_velocity_bound**2)
            | (jnp.sum(state.angular_velocity**2) > c.angular_velocity_bound**2)
            | ~jnp.all(jnp.isfinite(state.position))
        )

    # -- episode API -----------------------------------------------------
    def reset(
        self, key: jax.Array, params: DynamicsParams
    ) -> Tuple[EnvState, jnp.ndarray]:
        k_state, k_carry = jax.random.split(key)
        state = self.sample_state(k_state, params)
        h = self.config.observation.action_history_length
        d = self.config.observation.angular_velocity_delay
        action_history = jnp.zeros((h, 4), jnp.float32)
        angvel_history = jnp.broadcast_to(
            state.angular_velocity, (d + 1, 3)
        ).astype(jnp.float32)
        es = EnvState(
            dynamics=state,
            action_history=action_history,
            angvel_history=angvel_history,
            t=jnp.int32(0),
            key=k_carry,
        )
        return es, self.observe(
            params, state, action_history, angvel_history=angvel_history
        )

    def dynamics_step(
        self,
        params: DynamicsParams,
        state: State,
        action: jnp.ndarray,
        key: Optional[jax.Array] = None,
    ) -> Tuple[State, jnp.ndarray]:
        """Pure dynamics advance (l2f `step(...) -> dts`, README:96):
        disturbances sampled per control step when enabled."""
        if key is None:
            ext_f = jnp.zeros(3, jnp.float32)
            ext_t = jnp.zeros(3, jnp.float32)
        else:
            kf, kt = jax.random.split(key)
            ext_f = jax.random.normal(kf, (3,)) * params.disturbance_force_std
            ext_t = jax.random.normal(kt, (3,)) * params.disturbance_torque_std
        return dynamics.sub_step(
            params,
            state,
            action,
            self.config.dt,
            ext_f,
            ext_t,
            self.config.integrator,
        )

    def step(
        self, params: DynamicsParams, es: EnvState, action: jnp.ndarray
    ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
        """Full env step with auto-reset.

        Returns (next_env_state, obs, reward, done, info). `done` is
        termination OR episode-length truncation; info carries both flavors
        plus the pre-reset return-accounting fields.
        """
        action = jnp.clip(action, -1.0, 1.0)
        key_step, key_reset, key_carry = jax.random.split(es.key, 3)
        next_state, _ = self.dynamics_step(params, es.dynamics, action, key_step)
        reward = self.reward(params, es.dynamics, action, next_state)
        terminated = self.terminated(params, next_state)
        reward = reward - self.config.reward.termination_penalty * terminated
        t_next = es.t + 1
        truncated = t_next >= self.config.episode_length
        done = terminated | truncated

        reset_es, _ = self.reset(key_reset, params)
        action_history = jnp.concatenate(
            [es.action_history[1:], action[None]], axis=0
        )
        angvel_history = jnp.concatenate(
            [es.angvel_history[1:], next_state.angular_velocity[None]], axis=0
        )
        cont_es = EnvState(
            dynamics=next_state,
            action_history=action_history,
            angvel_history=angvel_history,
            t=t_next,
            key=key_carry,
        )
        next_es = jax.tree.map(
            lambda r, c: jnp.where(done, r, c), reset_es, cont_es
        )
        obs = self.observe(
            params,
            next_es.dynamics,
            next_es.action_history,
            angvel_history=next_es.angvel_history,
        )
        info = {
            "terminated": terminated,
            "truncated": truncated,
            # observation of the true (pre-reset) next state, for correct
            # bootstrapping in off-policy updates
            "final_obs": self.observe(
                params, next_state, action_history, angvel_history=angvel_history
            ),
        }
        return next_es, obs, reward, done, info

    # -- vector convenience ---------------------------------------------
    def vector_ops(self):
        """vmapped (reset, step) pair over a leading env axis in params,
        state, action, and keys."""
        v_reset = jax.vmap(self.reset, in_axes=(0, 0))
        v_step = jax.vmap(self.step, in_axes=(0, 0, 0))
        return v_reset, v_step
