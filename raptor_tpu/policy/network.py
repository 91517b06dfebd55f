"""The Raptor foundation-policy network: Dense(22->16, ReLU) -> GRU(16) ->
Dense(16->4, identity), 2,084 f32 parameters.

Reference contract (SURVEY.md §A.1/§A.2; reference ckpt.h:59-188 and
ckpt.h5::actor/*): GRU uses the PyTorch gate convention with gate order
(r, z, n) in slices 0:16 / 16:32 / 32:48, reset gate applied to the hidden
pre-activation AFTER matmul+bias, and a LEARNED initial hidden state.
Verified to reproduce ckpt.h5::example/output from ::example/input with max
abs error 8.3e-7 (f32, highest matmul precision).

Everything here is functional: parameters are a pytree (dict), apply-fns are
pure, and the sequence dimension runs under `jax.lax.scan` so the whole
500-step unroll is one XLA program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OBS_DIM = 22
ACTION_DIM = 4
HIDDEN_DIM = 16

Params = Dict[str, Any]


def init_params(
    key: jax.Array,
    obs_dim: int = OBS_DIM,
    hidden_dim: int = HIDDEN_DIM,
    action_dim: int = ACTION_DIM,
    dtype=jnp.float32,
) -> Params:
    """Initialize a fresh policy parameter pytree (same shapes as the
    reference h5 schema, SURVEY.md §A.1)."""
    k0, k1, k2, k3 = jax.random.split(key, 4)

    def uniform(k, shape, fan_in):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    return {
        "dense_0": {
            "weights": uniform(k0, (hidden_dim, obs_dim), obs_dim),
            "biases": jnp.zeros((hidden_dim,), dtype),
        },
        "gru_1": {
            "weights_input": uniform(k1, (3 * hidden_dim, hidden_dim), hidden_dim),
            "weights_hidden": uniform(k2, (3 * hidden_dim, hidden_dim), hidden_dim),
            "biases_input": jnp.zeros((3 * hidden_dim,), dtype),
            "biases_hidden": jnp.zeros((3 * hidden_dim,), dtype),
            "initial_hidden_state": jnp.zeros((hidden_dim,), dtype),
        },
        "dense_2": {
            "weights": uniform(k3, (action_dim, hidden_dim), hidden_dim),
            "biases": jnp.zeros((action_dim,), dtype),
        },
    }


def initial_hidden(params: Params, batch_size: int) -> jax.Array:
    """Learned initial hidden state broadcast to a batch (ckpt.h5::
    actor/layers/1/initial_hidden_state)."""
    h0 = params["gru_1"]["initial_hidden_state"]
    return jnp.broadcast_to(h0, (batch_size, h0.shape[-1]))


def gru_cell(params: Params, h: jax.Array, x: jax.Array) -> jax.Array:
    """One GRU step, PyTorch convention, gate order (r, z, n) — SURVEY §A.2.

    h: [B, H] hidden, x: [B, H] input. Returns new hidden [B, H].
    """
    g = params["gru_1"]
    n_h = h.shape[-1]
    # [B, 3H]: one matmul per stream; gates sliced out after.
    gi = x @ g["weights_input"].T + g["biases_input"]
    gh = h @ g["weights_hidden"].T + g["biases_hidden"]
    r = jax.nn.sigmoid(gi[..., :n_h] + gh[..., :n_h])
    z = jax.nn.sigmoid(gi[..., n_h : 2 * n_h] + gh[..., n_h : 2 * n_h])
    # reset gates the *hidden* pre-activation after matmul+bias (PyTorch conv)
    n = jnp.tanh(gi[..., 2 * n_h :] + r * gh[..., 2 * n_h :])
    return (1.0 - z) * n + z * h


def apply_step(
    params: Params, h: jax.Array, obs: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Single timestep: obs [B, 22] + hidden [B, 16] -> (new hidden, action [B, 4]).

    Mirrors Raptor.evaluate_step's layer traversal (SURVEY §4.1). The head is
    identity — the exported policy has no squash; deployment clips to [-1, 1]
    by the motor-command contract (reference README:27).
    """
    d0, d2 = params["dense_0"], params["dense_2"]
    x = jax.nn.relu(obs @ d0["weights"].T + d0["biases"])
    h_new = gru_cell(params, h, x)
    action = h_new @ d2["weights"].T + d2["biases"]
    return h_new, action


def apply_sequence(params: Params, obs_seq: jax.Array, h0: jax.Array | None = None):
    """Full-sequence forward: obs_seq [T, B, 22] -> actions [T, B, 4].

    Runs the recurrence as one `lax.scan` so XLA compiles the whole unroll;
    this replaces the reference's per-step Python/C++ boundary (SURVEY §4.2).
    Returns (final_hidden, actions).
    """
    if h0 is None:
        h0 = initial_hidden(params, obs_seq.shape[1])

    def step(h, obs_t):
        h_new, a = apply_step(params, h, obs_t)
        return h_new, a

    return jax.lax.scan(step, h0, obs_seq)


@functools.partial(jax.jit, static_argnames=())
def apply_sequence_jit(params: Params, obs_seq: jax.Array):
    return apply_sequence(params, obs_seq)


def fold_norm(params: Params, mean: jax.Array, std: jax.Array) -> Params:
    """Fold an observation standardizer into dense_0 (exact, affine-in-affine).

    The reference trains with an explicit standardize layer
    (rl-tools nn/layers/standardize, part of the training include set —
    SURVEY §3.2 row 13) but ships checkpoints without one: dense_0 absorbing
    `(obs - mean)/std` is lossless because both are affine:

        W ((x - mean)/std) + b  ==  (W/std) x + (b - (W/std) mean)

    Returns a plain reference-schema parameter pytree — exports, evals, and
    deployments need no knowledge that training was standardized.
    """
    d0 = params["dense_0"]
    w = d0["weights"] / std[None, :]
    b = d0["biases"] - w @ mean
    return {**params, "dense_0": {"weights": w, "biases": b}}


def num_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
