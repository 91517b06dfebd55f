"""Checkpoint/resume of full trainer state: bitwise-identical continuation."""

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.env import EnvConfig, L2F, sample_population
from raptor_tpu.rl import runner, sac
from raptor_tpu.utils import state_checkpoint as sck


def test_roundtrip_simple(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3)), "k": jax.random.key(7)}}
    sck.save_pytree(str(tmp_path / "state_100"), tree)
    got = sck.restore_pytree(str(tmp_path / "state_100"), tree)
    np.testing.assert_array_equal(np.asarray(got["a"]), np.arange(5.0))
    # restored PRNG key generates the same stream
    np.testing.assert_array_equal(
        np.asarray(jax.random.normal(got["b"]["k"], (3,))),
        np.asarray(jax.random.normal(tree["b"]["k"], (3,))),
    )
    found = sck.latest_checkpoint(str(tmp_path))
    assert found is not None and found[1] == 100


def test_resume_reproduces_training(tmp_path):
    """Save mid-training, restore, continue: identical to uninterrupted run."""
    env = L2F(EnvConfig())
    run_cfg = runner.RunnerConfig(
        n_envs=8, rollout_length=4, gradient_steps=4, batch_size=32,
        replay_capacity=64,
    )
    sac_cfg = sac.SACConfig(actor_hidden=(16, 16), critic_hidden=(16, 16))
    params = sample_population(jax.random.key(0), 8)
    state = runner.trainer_init(jax.random.key(1), env, params, run_cfg, sac_cfg)
    super_step = runner.make_super_step(env, run_cfg, sac_cfg)

    state, _ = super_step(state, params)
    sck.save_pytree(str(tmp_path / "state_1"), state)
    template = state

    # branch A: continue directly
    state_a, metrics_a = super_step(state, params)

    # branch B: restore from disk, then continue
    restored = sck.restore_pytree(str(tmp_path / "state_1"), template)
    state_b, metrics_b = super_step(restored, params)

    assert float(metrics_a.critic_loss) == float(metrics_b.critic_loss)
    for a, b in zip(jax.tree.leaves(state_a.sac.actor), jax.tree.leaves(state_b.sac.actor)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
