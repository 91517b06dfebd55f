"""NN stack for RL: MLP actor with squashed-Gaussian head + twin Q critics.

Functional mirror of the reference nn stack (SURVEY §3.2): `nn_models/mlp`,
`nn/layers/sample_and_squash` (tanh-squashed Gaussian sample + log-prob
correction), `nn/layers/dense`. No capability system — autodiff owns the
backward buffers (`jax.grad`); no CHANGE_BATCH_SIZE metaprogramming — shape
polymorphism is free under vmap/jit.

Everything is a plain dict pytree; apply fns are pure. Matmuls are batched
[B, in] @ [in, out] so XLA tiles them onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

LOG_STD_MIN = -10.0
LOG_STD_MAX = 2.0


# ---------------------------------------------------------------------------
# low-precision matmul: bf16 operands / f32 accumulation on the MXU, forward
# AND backward. Master weights stay f32; grads come back f32. This is the
# mixed-precision recipe for putting the tiny SAC learner matmuls — 94% of a
# flagship run's TPU time ran them as f32 VPU code at 26% of the VPU roofline
# (artifacts/profile_pretraining.json, VERDICT r3 weak #1) — onto the MXU.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def matmul_lp(dtype, x, w):
    """x @ w with both operands cast to `dtype` (e.g. bf16) and f32
    accumulation. Differentiable; the backward matmuls also run in `dtype`.
    x: [..., B, I], w: [..., I, O] with identical leading batch dims."""
    return jnp.matmul(
        x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32
    )


def _matmul_lp_fwd(dtype, x, w):
    xd, wd = x.astype(dtype), w.astype(dtype)
    y = jnp.matmul(xd, wd, preferred_element_type=jnp.float32)
    return y, (xd, wd)


def _matmul_lp_bwd(dtype, res, g):
    xd, wd = res
    gd = g.astype(dtype)
    dx = jnp.matmul(
        gd, jnp.swapaxes(wd, -1, -2), preferred_element_type=jnp.float32
    )
    dw = jnp.matmul(
        jnp.swapaxes(xd, -1, -2), gd, preferred_element_type=jnp.float32
    )
    return dx, dw


matmul_lp.defvjp(_matmul_lp_fwd, _matmul_lp_bwd)


def _dot(x, w, dtype: Optional[Any]):
    return x @ w if dtype is None else matmul_lp(dtype, x, w)


def _dense_init(key, in_dim: int, out_dim: int, scale: float = 1.0):
    kw, _ = jax.random.split(key)
    bound = scale / np.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def mlp_init(key, dims: Sequence[int], final_scale: float = 1.0) -> Params:
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, k in enumerate(keys):
        scale = final_scale if i == len(keys) - 1 else 1.0
        layers.append(_dense_init(k, dims[i], dims[i + 1], scale))
    return {"layers": layers}


def mlp_apply(
    params: Params, x: jnp.ndarray, activation=jax.nn.relu, dtype=None
) -> jnp.ndarray:
    """dtype=None: exact f32 (deployment/eval path). dtype=bf16: matmuls run
    on the MXU with f32 accumulation (training fast path; quality-gated)."""
    layers = params["layers"]
    for layer in layers[:-1]:
        x = activation(_dot(x, layer["w"], dtype) + layer["b"])
    last = layers[-1]
    return _dot(x, last["w"], dtype) + last["b"]


# ---------------------------------------------------------------------------
# standardize layer (reference nn/layers/standardize, README:114): input
# normalization that can be folded into the first dense layer at export time
# ---------------------------------------------------------------------------


def standardize_init(dim: int) -> Params:
    return {
        "mean": jnp.zeros((dim,), jnp.float32),
        "std": jnp.ones((dim,), jnp.float32),
    }


def standardize_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return (x - params["mean"]) / params["std"]


def standardize_from_batch(x: jnp.ndarray, eps: float = 1e-6) -> Params:
    """Fit mean/std over the leading axes of a data batch."""
    axes = tuple(range(x.ndim - 1))
    return {
        "mean": jnp.mean(x, axis=axes),
        "std": jnp.std(x, axis=axes) + eps,
    }


def fold_standardize_into_dense(std_params: Params, dense: Params) -> Params:
    """Fold (x-mean)/std into a following dense layer {w:[in,out], b:[out]}
    so the deployed network needs no separate standardize op (the
    reference's deployed policy has the normalizer folded in, SURVEY §3.2).
    """
    w, b = dense["w"], dense["b"]
    w_new = w / std_params["std"][:, None]
    b_new = b - (std_params["mean"] / std_params["std"]) @ w
    return {"w": w_new, "b": b_new}


# ---------------------------------------------------------------------------
# actor: obs -> (mu, log_std); sample-and-squash head
# ---------------------------------------------------------------------------


def actor_init(key, obs_dim: int, action_dim: int, hidden: Sequence[int] = (64, 64)):
    return mlp_init(key, [obs_dim, *hidden, 2 * action_dim], final_scale=0.01)


def actor_dist(
    params: Params, obs: jnp.ndarray, dtype=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    out = mlp_apply(params, obs, dtype=dtype)
    mu, log_std = jnp.split(out, 2, axis=-1)
    log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
    return mu, log_std


def sample_and_squash(
    key, mu: jnp.ndarray, log_std: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample a ~ tanh(N(mu, sigma)); return (action, log_prob) with the
    tanh change-of-variables correction (reference nn/layers/
    sample_and_squash, README:116)."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    action = jnp.tanh(pre)
    # N log-prob + log|d tanh^-1/da| summed over action dims; the stable form
    # log(1 - tanh(x)^2) = 2*(log2 - x - softplus(-2x))
    log_prob = jnp.sum(
        -0.5 * (eps**2) - log_std - 0.5 * np.log(2.0 * np.pi), axis=-1
    )
    log_prob -= jnp.sum(
        2.0 * (np.log(2.0) - pre - jax.nn.softplus(-2.0 * pre)), axis=-1
    )
    return action, log_prob


def actor_sample(params: Params, key, obs: jnp.ndarray, dtype=None):
    mu, log_std = actor_dist(params, obs, dtype=dtype)
    return sample_and_squash(key, mu, log_std)


def actor_mean(params: Params, obs: jnp.ndarray) -> jnp.ndarray:
    """Deterministic (eval) action."""
    mu, _ = actor_dist(params, obs)
    return jnp.tanh(mu)


# ---------------------------------------------------------------------------
# twin critics: (obs, action) -> q
# ---------------------------------------------------------------------------


def critic_init(key, obs_dim: int, action_dim: int, hidden: Sequence[int] = (64, 64)):
    k1, k2 = jax.random.split(key)
    dims = [obs_dim + action_dim, *hidden, 1]
    return {"q1": mlp_init(k1, dims), "q2": mlp_init(k2, dims)}


def critic_apply(
    params: Params,
    obs: jnp.ndarray,
    action: jnp.ndarray,
    dtype=None,
    stacked: bool = False,
):
    """Twin Q values. stacked=True executes q1/q2 as ONE batched matmul per
    layer ([2, B, I] @ [2, I, O]) — numerically identical, half the op count
    (the population learner is small-op-bound, not FLOP-bound)."""
    x = jnp.concatenate([obs, action], axis=-1)
    if not stacked:
        q1 = mlp_apply(params["q1"], x, dtype=dtype)[..., 0]
        q2 = mlp_apply(params["q2"], x, dtype=dtype)[..., 0]
        return q1, q2
    l1, l2 = params["q1"]["layers"], params["q2"]["layers"]
    h = jnp.broadcast_to(x, (2,) + x.shape)
    n_layers = len(l1)
    for i in range(n_layers):
        w = jnp.stack([l1[i]["w"], l2[i]["w"]])
        b = jnp.stack([l1[i]["b"], l2[i]["b"]])[:, None, :]
        h = _dot(h, w, dtype) + b
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h[0, ..., 0], h[1, ..., 0]
