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


@pytest.mark.slow
def test_eval_parity_protocol_reproduces_reference_stats():
    """The measured eval-parity protocol (types.eval_parity_init,
    max_angle=1.0): the shipped reference policy on OUR random-airframe
    population reproduces its own logged final eval stats (482.8/500
    episode length, 4.2% terminated — BASELINE.md). Calibration sweep:
    apps/eval_parity.py -> artifacts/eval_parity_sweep.json."""
    from raptor_tpu.env import sample_population
    from raptor_tpu.env.types import eval_parity_init

    params = ckpt_h5.load_actor(shipped_checkpoint_path())
    env = L2F(EnvConfig(init=eval_parity_init()))
    n_airframes, envs_per = 16, 4
    frames = sample_population(jax.random.key(7), n_airframes)
    stacked = jax.tree.map(lambda x: jnp.repeat(x, envs_per, axis=0), frames)
    m = n_airframes * envs_per
    step_fn, carry = evaluation.gru_policy_step(params, m)
    stats = evaluation.evaluate(env, stacked, step_fn, carry,
                                jax.random.key(8), m, 500)
    # envelope around the reference's logged 482.8 / 4.2% (small-sample
    # tolerance: 64 episodes here vs 256 in the calibration sweep)
    assert 460.0 <= float(stats.episode_length_mean) <= 500.0
    assert float(stats.share_terminated) <= 0.10
