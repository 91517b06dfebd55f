"""Fused policy+env eval kernel: parity vs the XLA closed-loop rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, InitConfig, L2F, presets
from raptor_tpu.ops import pallas_eval as pe
from raptor_tpu.policy import network as policy_net, shipped_checkpoint_path


@pytest.fixture(scope="module")
def setup():
    env = L2F(EnvConfig(init=InitConfig(max_angle=0.5, position_range=0.2,
                                        linear_velocity_std=0.05,
                                        angular_velocity_std=0.05)))
    policy = ckpt_h5.load_actor(shipped_checkpoint_path())
    n = 128
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), presets.crazyflie()
    )
    v_reset, _ = env.vector_ops()
    es, _ = v_reset(jax.random.split(jax.random.key(0), n), params)
    return env, policy, params, es.dynamics, n


def xla_closed_loop(env, policy, params, state0, n, steps):
    """Reference implementation: policy + dynamics + reward/termination with
    freeze-on-termination, matching the kernel's semantics."""
    v_dyn = jax.vmap(lambda p, s, a: env.dynamics_step(p, s, a)[0])
    v_obs = jax.vmap(env.observe)
    v_rew = jax.vmap(env.reward)
    v_term = jax.vmap(env.terminated)

    h = policy_net.initial_hidden(policy, n)
    prev = jnp.zeros((n, 4))
    alive = jnp.ones((n,))
    ret = jnp.zeros((n,))
    length = jnp.zeros((n,))
    s = state0
    for _ in range(steps):
        obs = v_obs(params, s, prev)[:, :22]
        h_new, action = policy_net.apply_step(policy, h, obs)
        action = jnp.clip(action, -1.0, 1.0)
        s2 = v_dyn(params, s, action)
        reward = v_rew(params, s, action, s2)
        dead = v_term(params, s2).astype(jnp.float32)
        alive2 = alive * (1.0 - dead)
        ret = ret + reward * alive
        length = length + alive
        keep = alive2[:, None]
        s = jax.tree.map(
            lambda a, b: a * keep.reshape((n,) + (1,) * (a.ndim - 1))
            + b * (1 - keep.reshape((n,) + (1,) * (a.ndim - 1))),
            s2, s,
        )
        h = h_new * keep + h * (1 - keep)
        prev = action * keep + prev * (1 - keep)
        alive = alive2
    return s, alive, length, ret


def test_fused_eval_matches_xla(setup):
    env, policy, params, state0, n = setup
    steps = 25
    s_ref, alive_ref, len_ref, ret_ref = xla_closed_loop(
        env, policy, params, state0, n, steps
    )
    with pltpu.force_tpu_interpret_mode():
        s, alive, length, ret = pe.fused_policy_eval(
            policy, params, state0, steps
        )
    np.testing.assert_array_equal(np.asarray(alive), np.asarray(alive_ref))
    np.testing.assert_array_equal(np.asarray(length), np.asarray(len_ref))
    np.testing.assert_allclose(
        np.asarray(ret), np.asarray(ret_ref), atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(s.position), np.asarray(s_ref.position), atol=1e-3
    )


def test_fused_eval_policy_flies(setup):
    """The shipped policy stabilizes crazyflies inside the kernel too."""
    env, policy, params, state0, n = setup
    with pltpu.force_tpu_interpret_mode():
        s, alive, length, ret = pe.fused_policy_eval(
            policy, params, state0, 100
        )
    assert float(np.mean(np.asarray(length))) > 95.0
    assert float(np.mean(np.asarray(alive))) > 0.9
    assert float(np.mean(np.asarray(ret))) > 80.0
