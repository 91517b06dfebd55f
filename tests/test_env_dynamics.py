"""Physics self-consistency tests for the JAX l2f engine (SURVEY §5.3:
until upstream parity testing is possible — no network — verify analytic
hover equilibrium, integrator order, frame conventions, and determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.env import (
    EnvConfig,
    L2F,
    RandomizationConfig,
    State,
    dynamics,
    maths,
    presets,
    sample_population,
)


@pytest.fixture(scope="module")
def env():
    return L2F(EnvConfig())


def hover_state(params):
    return State(
        position=jnp.zeros(3),
        orientation=jnp.array([1.0, 0.0, 0.0, 0.0]),
        linear_velocity=jnp.zeros(3),
        angular_velocity=jnp.zeros(3),
        rpm=jnp.broadcast_to(dynamics.hover_rpm(params), (4,)),
    )


@pytest.mark.parametrize("preset", [presets.crazyflie, presets.x500])
def test_hover_equilibrium(env, preset):
    """At hover rpm + hover action, the quad stays put to tight tolerance."""
    params = preset()
    state = hover_state(params)
    action = jnp.broadcast_to(dynamics.hover_action(params), (4,))
    for _ in range(100):
        state, _ = env.dynamics_step(params, state, action)
    assert float(jnp.linalg.norm(state.position)) < 1e-3
    assert float(jnp.linalg.norm(state.linear_velocity)) < 1e-3
    assert float(jnp.linalg.norm(state.angular_velocity)) < 1e-3


def test_free_fall(env):
    """Zero thrust -> gravity acceleration, world z down."""
    params = presets.crazyflie()
    params = params.replace(thrust_curve=jnp.zeros(3))
    state = hover_state(params)
    t = 0.5
    for _ in range(50):
        state, _ = env.dynamics_step(params, state, -jnp.ones(4))
    # p = -0.5 g t^2
    assert abs(float(state.position[2]) - (-0.5 * 9.81 * t * t)) < 1e-2
    assert abs(float(state.linear_velocity[2]) - (-9.81 * t)) < 1e-3


def test_thrust_direction_flu(env):
    """Full throttle from hover accelerates +z (FLU, z up)."""
    params = presets.x500()
    state = hover_state(params)
    for _ in range(20):
        state, _ = env.dynamics_step(params, state, jnp.ones(4))
    assert float(state.position[2]) > 0.01
    assert abs(float(state.position[0])) < 5e-3
    assert abs(float(state.position[1])) < 5e-3


def test_yaw_torque_signs(env):
    """Spinning up the -1-torque rotor pair (FR,BL) yaws negative."""
    params = presets.x500()
    state = hover_state(params)
    h = dynamics.hover_action(params)
    # boost FR+BL, cut BR+FL: roll/pitch moments cancel, yaw builds
    action = jnp.array([h + 0.2, h - 0.2, h + 0.2, h - 0.2])
    for _ in range(10):
        state, _ = env.dynamics_step(params, state, action)
    assert float(state.angular_velocity[2]) < -1e-3  # -z yaw
    assert abs(float(state.angular_velocity[0])) < 1e-4
    assert abs(float(state.angular_velocity[1])) < 1e-4


def test_rk4_order_vs_euler(env):
    """RK4 at dt must be much closer to tiny-step ground truth than Euler."""
    params = presets.crazyflie()
    state0 = hover_state(params).replace(
        angular_velocity=jnp.array([2.0, -1.0, 0.5]),
        linear_velocity=jnp.array([0.5, 0.2, -0.3]),
    )
    action = jnp.full((4,), 0.3)

    def rollout(method, dt, n):
        e = L2F(EnvConfig(dt=dt, integrator=method))
        s = state0
        for _ in range(n):
            s, _ = e.dynamics_step(params, s, action)
        return s

    truth = rollout("rk4", 0.0005, 400)  # 0.2 s
    rk4 = rollout("rk4", 0.01, 20)
    euler = rollout("euler", 0.01, 20)

    def err(s):
        return float(
            jnp.linalg.norm(s.position - truth.position)
            + jnp.linalg.norm(s.orientation - truth.orientation)
        )

    assert err(rk4) < err(euler) * 0.02
    assert err(rk4) < 1e-5


def test_quaternion_rotation_consistency():
    key = jax.random.key(0)
    q = maths.random_quaternion(key)
    v = jnp.array([0.3, -0.7, 0.2])
    np.testing.assert_allclose(
        np.asarray(maths.quat_to_rotm(q) @ v),
        np.asarray(maths.quat_rotate(q, v)),
        atol=1e-6,
    )
    # orthonormality
    r = np.asarray(maths.quat_to_rotm(q))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert abs(np.linalg.det(r) - 1.0) < 1e-6


def test_vectorized_step_and_determinism(env):
    """vmapped rollout over randomized population; same seed => same result."""
    n = 32
    key = jax.random.key(42)
    kp, kr = jax.random.split(key)
    params = sample_population(kp, n)
    v_reset, v_step = env.vector_ops()

    def run():
        es, obs = v_reset(jax.random.split(kr, n), params)
        assert obs.shape == (n, env.OBSERVATION_DIM)
        for _ in range(10):
            es, obs, r, d, _ = v_step(params, es, jnp.zeros((n, 4)))
        return obs, r, d

    o1, r1, d1 = run()
    o2, r2, d2 = run()
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert o1.shape == (n, env.OBSERVATION_DIM)
    assert np.all(np.isfinite(np.asarray(o1)))


def test_observation_layout(env):
    """First 22 dims follow the reference meta string ordering."""
    params = presets.x500()
    state = hover_state(params).replace(
        position=jnp.array([0.1, 0.2, 0.3]),
        linear_velocity=jnp.array([1.0, 2.0, 3.0]),
        angular_velocity=jnp.array([4.0, 5.0, 6.0]),
    )
    prev_action = jnp.array([0.1, -0.2, 0.3, -0.4])
    obs = np.asarray(env.observe(params, state, prev_action))
    np.testing.assert_allclose(obs[0:3], [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(obs[3:12], np.eye(3).flatten(), atol=1e-6)
    np.testing.assert_allclose(obs[12:15], [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(obs[15:18], [4.0, 5.0, 6.0], atol=1e-6)
    np.testing.assert_allclose(obs[18:22], prev_action, atol=1e-6)
    assert obs.shape == (env.OBSERVATION_DIM,)


def test_termination_and_autoreset(env):
    params = presets.crazyflie()
    # out-of-bounds position terminates
    bad = hover_state(params).replace(position=jnp.array([1.0, 0.0, 0.0]))
    assert bool(env.terminated(params, bad))
    ok = hover_state(params)
    assert not bool(env.terminated(params, ok))

    # stepping a terminated state auto-resets within bounds
    from raptor_tpu.env.quad import EnvState

    es = EnvState(
        dynamics=bad.replace(position=jnp.array([0.59, 0.0, 0.0]),
                             linear_velocity=jnp.array([50.0, 0.0, 0.0])),
        action_history=jnp.zeros((1, 4)),
        angvel_history=jnp.zeros((1, 3)),
        t=jnp.int32(3),
        key=jax.random.key(1),
    )
    next_es, obs, r, done, info = env.step(params, es, jnp.zeros(4))
    assert bool(done)
    assert int(next_es.t) == 0
    assert np.all(np.abs(np.asarray(next_es.dynamics.position)) <= 0.3 + 1e-6)


def test_randomization_spans_crazyflie_to_x500():
    params = sample_population(jax.random.key(0), 2048, RandomizationConfig())
    mass = np.asarray(params.mass)
    assert mass.min() < 0.035 and mass.max() > 2.0
    t2w = np.asarray(
        jax.vmap(
            lambda p: jnp.sum(dynamics.rotor_thrusts(p, jnp.full((4,), p.rpm_max)))
            / (p.mass * 9.81)
        )(params)
    )
    assert t2w.min() > 1.3 and t2w.max() < 4.3
    # every sampled airframe can hover (hover action strictly inside [-1,1])
    ha = np.asarray(jax.vmap(dynamics.hover_action)(params))
    assert np.all(ha > -1.0) and np.all(ha < 1.0)


def test_reward_scale_near_hover(env):
    """Near-hover reward lands in the ~1.24/step regime (SURVEY §6.2)."""
    params = presets.crazyflie()
    state = hover_state(params)
    action = jnp.broadcast_to(dynamics.hover_action(params), (4,))
    next_state, _ = env.dynamics_step(params, state, action)
    r = float(env.reward(params, state, action, next_state))
    assert 1.0 < r <= 1.6


def test_action_history_and_angvel_delay():
    """ActionHistory(h>1) + AngularVelocityDelayed(d>0) obs-spec variants."""
    from raptor_tpu.env.types import ObservationConfig

    cfg = EnvConfig(
        observation=ObservationConfig(
            action_history_length=3, angular_velocity_delay=2, privileged=False
        )
    )
    env2 = L2F(cfg)
    assert env2.OBSERVATION_DIM == 18 + 4 * 3
    params = presets.crazyflie()
    es, obs = env2.reset(jax.random.key(0), params)
    assert es.action_history.shape == (3, 4)
    assert es.angvel_history.shape == (3, 3)
    # step with distinct actions; history must roll oldest -> newest
    a1 = jnp.full((4,), 0.1)
    a2 = jnp.full((4,), 0.2)
    es, obs, *_ = env2.step(params, es, a1)
    es, obs, *_ = env2.step(params, es, a2)
    hist = np.asarray(es.action_history)
    np.testing.assert_allclose(hist[0], np.zeros(4), atol=1e-7)
    np.testing.assert_allclose(hist[1], 0.1, atol=1e-7)
    np.testing.assert_allclose(hist[2], 0.2, atol=1e-7)
    # obs tail is the flattened history
    np.testing.assert_allclose(np.asarray(obs)[18:30], hist.reshape(-1), atol=1e-7)
    # the delayed angular velocity in obs equals the 2-step-old sample
    np.testing.assert_allclose(
        np.asarray(obs)[15:18], np.asarray(es.angvel_history)[0], atol=1e-7
    )
    # prev_action property
    np.testing.assert_allclose(np.asarray(es.prev_action), 0.2, atol=1e-7)
