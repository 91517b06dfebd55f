"""Cross-validation: the SHIPPED reference policy (trained on real l2f)
must fly OUR JAX simulator.

This is the strongest available sim-parity signal without network access to
the l2f wheel (SURVEY §8.1/§5.3): a policy trained on the reference
dynamics stabilizes our crazyflie from moderate initial attitudes for full
episodes. Measured: 500/500 steps, 0% termination, return ~747 (reference's
own aggregate eval: 483/500, 4% termination, SURVEY §6.2)."""

import jax
import jax.numpy as jnp
import pytest

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, InitConfig, L2F, presets
from raptor_tpu.policy import shipped_checkpoint_path
from raptor_tpu.rl import evaluation


@pytest.mark.slow
def test_shipped_policy_flies_our_crazyflie():
    params = ckpt_h5.load_actor(shipped_checkpoint_path())
    env = L2F(
        EnvConfig(
            init=InitConfig(
                max_angle=1.0,
                position_range=0.2,
                linear_velocity_std=0.1,
                angular_velocity_std=0.1,
            )
        )
    )
    m = 32
    frames = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (m,) + x.shape), presets.crazyflie()
    )
    step_fn, carry = evaluation.gru_policy_step(params, m)
    stats = evaluation.evaluate(
        env, frames, step_fn, carry, jax.random.key(0), m, 500
    )
    assert float(stats.episode_length_mean) > 480.0
    assert float(stats.share_terminated) < 0.05
    assert float(stats.return_mean) > 500.0


@pytest.mark.slow
def test_shipped_policy_flies_x500_class():
    """Zero-shot across airframe scale (the foundation-policy property)."""
    params = ckpt_h5.load_actor(shipped_checkpoint_path())
    env = L2F(
        EnvConfig(
            init=InitConfig(max_angle=0.5, position_range=0.2,
                            linear_velocity_std=0.05, angular_velocity_std=0.05)
        )
    )
    m = 16
    frames = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (m,) + x.shape), presets.x500()
    )
    step_fn, carry = evaluation.gru_policy_step(params, m)
    stats = evaluation.evaluate(
        env, frames, step_fn, carry, jax.random.key(1), m, 500
    )
    assert float(stats.episode_length_mean) > 400.0
    assert float(stats.share_terminated) < 0.25
