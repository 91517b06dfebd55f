"""HBM-resident replay buffers as donated jax.Arrays.

TPU-native redesign of the reference's `rl/components/replay_buffer` (ring
buffer of contiguous arrays, SURVEY §3.4): the buffer lives in HBM as a
pytree of [capacity, n_envs, d] arrays, writes are `dynamic_update_slice`
at a ring pointer, sampling gathers random (time, env) pairs — all inside
jit, zero host traffic. Donate the buffer argument at the jit boundary so
updates are in-place.

Two flavors:
- `TransitionBuffer`: flat (s, a, r, s', done) transitions for MLP SAC.
- `SequenceBuffer`: whole [T]-step episode slots for GRU/BPTT training
  (SURVEY §7 Stage 3), storing hidden-state-free sequences; subsequences
  are sampled with their stored reset masks so BPTT can burn in.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


class TransitionBuffer(struct.PyTreeNode):
    obs: jnp.ndarray  # [C, N, obs_dim]
    action: jnp.ndarray  # [C, N, act_dim]
    reward: jnp.ndarray  # [C, N]
    next_obs: jnp.ndarray  # [C, N, obs_dim]
    done: jnp.ndarray  # [C, N] float (1.0 = terminated; truncation excluded)
    ptr: jnp.ndarray  # [] int32 ring pointer
    size: jnp.ndarray  # [] int32 filled rows

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]

    @property
    def n_envs(self) -> int:
        return self.obs.shape[1]


def transition_buffer_init(
    capacity: int, n_envs: int, obs_dim: int, action_dim: int
) -> TransitionBuffer:
    return TransitionBuffer(
        obs=jnp.zeros((capacity, n_envs, obs_dim), jnp.float32),
        action=jnp.zeros((capacity, n_envs, action_dim), jnp.float32),
        reward=jnp.zeros((capacity, n_envs), jnp.float32),
        next_obs=jnp.zeros((capacity, n_envs, obs_dim), jnp.float32),
        done=jnp.zeros((capacity, n_envs), jnp.float32),
        ptr=jnp.int32(0),
        size=jnp.int32(0),
    )


def transition_buffer_add(
    buf: TransitionBuffer,
    obs: jnp.ndarray,  # [N, obs_dim]
    action: jnp.ndarray,
    reward: jnp.ndarray,
    next_obs: jnp.ndarray,
    done: jnp.ndarray,
) -> TransitionBuffer:
    """Append one time-row of transitions for all envs (ring write)."""
    i = buf.ptr

    def put(arr, row):
        return jax.lax.dynamic_update_slice_in_dim(
            arr, row[None].astype(arr.dtype), i, axis=0
        )

    return buf.replace(
        obs=put(buf.obs, obs),
        action=put(buf.action, action),
        reward=put(buf.reward, reward),
        next_obs=put(buf.next_obs, next_obs),
        done=put(buf.done, done),
        ptr=(i + 1) % buf.capacity,
        size=jnp.minimum(buf.size + 1, buf.capacity),
    )


def transition_buffer_add_rollout(
    buf: TransitionBuffer,
    obs: jnp.ndarray,  # [H, N, obs_dim] — a whole collected rollout at once
    action: jnp.ndarray,
    reward: jnp.ndarray,
    next_obs: jnp.ndarray,
    done: jnp.ndarray,
) -> TransitionBuffer:
    """Bulk ring write of H time-rows (wraps around via double write)."""
    h = obs.shape[0]
    cap = buf.capacity
    idx = (buf.ptr + jnp.arange(h)) % cap

    def put(arr, rows):
        return arr.at[idx].set(rows.astype(arr.dtype))

    return buf.replace(
        obs=put(buf.obs, obs),
        action=put(buf.action, action),
        reward=put(buf.reward, reward),
        next_obs=put(buf.next_obs, next_obs),
        done=put(buf.done, done),
        ptr=(buf.ptr + h) % cap,
        size=jnp.minimum(buf.size + h, cap),
    )


def transition_buffer_sample(
    buf: TransitionBuffer, key: jax.Array, batch_size: int
) -> Tuple[jnp.ndarray, ...]:
    """Uniform minibatch over (filled time rows) x (envs)."""
    kt, ke = jax.random.split(key)
    t_idx = jax.random.randint(kt, (batch_size,), 0, jnp.maximum(buf.size, 1))
    e_idx = jax.random.randint(ke, (batch_size,), 0, buf.n_envs)
    return (
        buf.obs[t_idx, e_idx],
        buf.action[t_idx, e_idx],
        buf.reward[t_idx, e_idx],
        buf.next_obs[t_idx, e_idx],
        buf.done[t_idx, e_idx],
    )


def transition_buffer_sample_rows(
    buf: TransitionBuffer, key: jax.Array, batch_size: int
) -> Tuple[jnp.ndarray, ...]:
    """Row-contiguous minibatch: sample `batch_size / n_envs` whole time
    rows (all envs of each row) instead of scattered (time, env) pairs.

    Rationale (measured, TPU v5e): the uniform sampler's random (t, e)
    gather is ~88% of the population train phase — 256 per-element
    gathers per minibatch run at the chip's slow scatter/gather rate.
    A whole row is a contiguous [n_envs, d] block, so this sampler is
    `rows` dynamic slices instead of `batch` element gathers. The envs
    within a row are independent trajectories (separate env instances),
    so in-batch correlation is across-time only: samples share at most
    `rows` distinct timesteps per batch. Quality-gated against the
    uniform sampler at the 30.7M-step wave budget (equal teacher return)
    before becoming a default; see artifacts/profile_fastpath.json.
    """
    rows, rem = divmod(batch_size, buf.n_envs)
    if rem or rows < 1:
        raise ValueError(
            f"batch_size {batch_size} must be a positive multiple of "
            f"n_envs {buf.n_envs} for row sampling"
        )
    t_idx = jax.random.randint(key, (rows,), 0, jnp.maximum(buf.size, 1))

    def take(arr):
        return arr[t_idx].reshape((batch_size,) + arr.shape[2:])

    return (
        take(buf.obs),
        take(buf.action),
        take(buf.reward),
        take(buf.next_obs),
        take(buf.done),
    )


# ---------------------------------------------------------------------------
# sequence replay (GRU / BPTT)
# ---------------------------------------------------------------------------


class SequenceBuffer(struct.PyTreeNode):
    """Ring of time-rows with episode-boundary masks, sampled as fixed-length
    subsequences for BPTT (SURVEY §7 Stage 3). Stores the same per-step
    tuple as TransitionBuffer plus a `reset` flag marking step 0 of an
    episode, so sampled windows can mask recurrent carries across
    boundaries."""

    obs: jnp.ndarray  # [C, N, obs_dim]
    action: jnp.ndarray  # [C, N, act_dim]
    reward: jnp.ndarray  # [C, N]
    done: jnp.ndarray  # [C, N] terminated (bootstrapping mask)
    reset: jnp.ndarray  # [C, N] 1.0 where this row starts a new episode
    ptr: jnp.ndarray
    size: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]

    @property
    def n_envs(self) -> int:
        return self.obs.shape[1]


def sequence_buffer_init(
    capacity: int, n_envs: int, obs_dim: int, action_dim: int
) -> SequenceBuffer:
    return SequenceBuffer(
        obs=jnp.zeros((capacity, n_envs, obs_dim), jnp.float32),
        action=jnp.zeros((capacity, n_envs, action_dim), jnp.float32),
        reward=jnp.zeros((capacity, n_envs), jnp.float32),
        done=jnp.zeros((capacity, n_envs), jnp.float32),
        reset=jnp.zeros((capacity, n_envs), jnp.float32),
        ptr=jnp.int32(0),
        size=jnp.int32(0),
    )


def sequence_buffer_add_rollout(
    buf: SequenceBuffer,
    obs: jnp.ndarray,  # [H, N, obs_dim]
    action: jnp.ndarray,
    reward: jnp.ndarray,
    done: jnp.ndarray,
    reset: jnp.ndarray,
) -> SequenceBuffer:
    h = obs.shape[0]
    cap = buf.capacity
    idx = (buf.ptr + jnp.arange(h)) % cap

    def put(arr, rows):
        return arr.at[idx].set(rows.astype(arr.dtype))

    return buf.replace(
        obs=put(buf.obs, obs),
        action=put(buf.action, action),
        reward=put(buf.reward, reward),
        done=put(buf.done, done),
        reset=put(buf.reset, reset),
        ptr=(buf.ptr + h) % cap,
        size=jnp.minimum(buf.size + h, cap),
    )


def sequence_buffer_sample(
    buf: SequenceBuffer, key: jax.Array, batch_size: int, seq_len: int
):
    """Sample [batch, seq_len] windows: returns dict of [B, T, ...] arrays.

    Windows are drawn from filled rows only and in *logical* (time) order:
    logical index 0 is the oldest surviving row, so once the ring wraps a
    window can never straddle the write pointer (which would splice
    newest-next-to-oldest data with no reset flag at the seam). `reset`
    within a window tells the consumer where to re-inject the learned
    initial hidden state.
    """
    kt, ke = jax.random.split(key)
    max_start = jnp.maximum(buf.size - seq_len, 1)
    t0 = jax.random.randint(kt, (batch_size,), 0, max_start)
    e_idx = jax.random.randint(ke, (batch_size,), 0, buf.n_envs)
    # logical -> physical ring mapping (oldest row = ptr - size mod cap)
    base = (buf.ptr - buf.size + buf.capacity) % buf.capacity
    t_idx = (base + t0[:, None] + jnp.arange(seq_len)[None, :]) % buf.capacity
    e_full = e_idx[:, None].repeat(seq_len, axis=1)
    return {
        "obs": buf.obs[t_idx, e_full],
        "action": buf.action[t_idx, e_full],
        "reward": buf.reward[t_idx, e_full],
        "done": buf.done[t_idx, e_full],
        "reset": buf.reset[t_idx, e_full],
        "env_idx": e_idx,
    }
