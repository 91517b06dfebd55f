"""Replay buffer semantics: ring writes, wraparound, sampling bounds."""

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.rl import replay


def test_transition_ring_wraparound():
    buf = replay.transition_buffer_init(capacity=8, n_envs=2, obs_dim=3, action_dim=1)
    for i in range(11):
        row = jnp.full((2, 3), float(i))
        buf = replay.transition_buffer_add(
            buf, row, jnp.zeros((2, 1)), jnp.zeros(2), row + 0.5, jnp.zeros(2)
        )
    assert int(buf.size) == 8
    assert int(buf.ptr) == 11 % 8
    # oldest surviving rows are 3..10; slot of i is i % 8
    got = sorted(float(buf.obs[t, 0, 0]) for t in range(8))
    assert got == [3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]


def test_bulk_rollout_write_matches_single_writes():
    o = jnp.arange(5 * 2 * 3, dtype=jnp.float32).reshape(5, 2, 3)
    a = jnp.ones((5, 2, 1))
    r = jnp.arange(5 * 2, dtype=jnp.float32).reshape(5, 2)
    d = jnp.zeros((5, 2))
    b1 = replay.transition_buffer_init(capacity=8, n_envs=2, obs_dim=3, action_dim=1)
    b1 = b1.replace(ptr=jnp.int32(6))  # force wraparound
    b2 = b1
    b1 = replay.transition_buffer_add_rollout(b1, o, a, r, o, d)
    for t in range(5):
        b2 = replay.transition_buffer_add(b2, o[t], a[t], r[t], o[t], d[t])
    np.testing.assert_array_equal(np.asarray(b1.obs), np.asarray(b2.obs))
    assert int(b1.ptr) == int(b2.ptr)
    assert int(b1.size) == int(b2.size)


def test_sampling_respects_fill_level():
    buf = replay.transition_buffer_init(capacity=100, n_envs=4, obs_dim=2, action_dim=1)
    rows = jnp.ones((3, 4, 2))
    buf = replay.transition_buffer_add_rollout(
        buf, rows, jnp.ones((3, 4, 1)), jnp.ones((3, 4)), rows, jnp.zeros((3, 4))
    )
    obs, *_ = replay.transition_buffer_sample(buf, jax.random.key(0), 256)
    # only filled rows (all ones) may be sampled
    np.testing.assert_array_equal(np.asarray(obs), np.ones((256, 2)))


def test_sequence_buffer_windows():
    buf = replay.sequence_buffer_init(capacity=64, n_envs=2, obs_dim=2, action_dim=1)
    t_vals = jnp.arange(40, dtype=jnp.float32)
    obs = jnp.tile(t_vals[:, None, None], (1, 2, 2))
    reset = (t_vals % 10 == 0).astype(jnp.float32)[:, None].repeat(2, 1)
    buf = replay.sequence_buffer_add_rollout(
        buf, obs, jnp.zeros((40, 2, 1)), jnp.zeros((40, 2)), jnp.zeros((40, 2)), reset
    )
    out = replay.sequence_buffer_sample(buf, jax.random.key(1), 16, 8)
    o = np.asarray(out["obs"])  # [16, 8, 2]
    assert o.shape == (16, 8, 2)
    # windows are consecutive rows
    diffs = np.diff(o[:, :, 0], axis=1)
    np.testing.assert_array_equal(diffs, np.ones_like(diffs))
    # windows only from filled region
    assert o.max() <= 39.0


def test_sequence_windows_never_straddle_ring_seam():
    """Regression: after wraparound, raw-index windows could splice
    newest-next-to-oldest rows with no reset flag at the seam."""
    cap, T = 16, 4
    buf = replay.sequence_buffer_init(capacity=cap, n_envs=1, obs_dim=1, action_dim=1)
    # write 40 rows of a strictly increasing counter -> buffer wraps twice
    t_vals = jnp.arange(40, dtype=jnp.float32)
    obs = t_vals[:, None, None]
    z = jnp.zeros((40, 1))
    buf = replay.sequence_buffer_add_rollout(
        buf, obs, jnp.zeros((40, 1, 1)), z, z, z
    )
    out = replay.sequence_buffer_sample(buf, jax.random.key(0), 64, T)
    o = np.asarray(out["obs"])[:, :, 0]  # [64, T]
    # every sampled window must be consecutive in logical time
    diffs = np.diff(o, axis=1)
    np.testing.assert_array_equal(diffs, np.ones_like(diffs))
    # and drawn only from the surviving rows (24..39)
    assert o.min() >= 24.0 and o.max() <= 39.0
