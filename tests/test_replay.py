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


def test_row_sampling_respects_fill_level_and_pairs_rows():
    buf = replay.transition_buffer_init(capacity=100, n_envs=4, obs_dim=2, action_dim=1)
    # row t has obs == t, env e has action == e (to check row/env pairing)
    t_vals = jnp.arange(7, dtype=jnp.float32)
    obs = jnp.tile(t_vals[:, None, None], (1, 4, 2))
    act = jnp.tile(jnp.arange(4, dtype=jnp.float32)[None, :, None], (7, 1, 1))
    buf = replay.transition_buffer_add_rollout(
        buf, obs, act, jnp.ones((7, 4)), obs + 0.5, jnp.zeros((7, 4))
    )
    o, a, r, no, d = replay.transition_buffer_sample_rows(
        buf, jax.random.key(0), 64
    )
    assert o.shape == (64, 2) and a.shape == (64, 1)
    o_np, a_np, no_np = np.asarray(o), np.asarray(a), np.asarray(no)
    # only filled rows sampled
    assert o_np.min() >= 0.0 and o_np.max() <= 6.0
    # each group of n_envs consecutive samples is one whole time row ...
    groups = o_np[:, 0].reshape(16, 4)
    np.testing.assert_array_equal(groups, groups[:, :1].repeat(4, axis=1))
    # ... covering all envs in order, with fields staying paired
    np.testing.assert_array_equal(
        a_np[:, 0].reshape(16, 4), np.tile(np.arange(4.0), (16, 1))
    )
    np.testing.assert_allclose(no_np[:, 0], o_np[:, 0] + 0.5)
    # multiple distinct rows get drawn
    assert len(np.unique(groups[:, 0])) > 1


def test_row_sampling_rejects_indivisible_batch():
    buf = replay.transition_buffer_init(capacity=8, n_envs=3, obs_dim=2, action_dim=1)
    import pytest

    with pytest.raises(ValueError):
        replay.transition_buffer_sample_rows(buf, jax.random.key(0), 16)


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
