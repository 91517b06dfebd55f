"""Fused policy+env evaluation rollout: the ENTIRE closed-loop system in one
Pallas kernel.

The foundation policy is 2,084 parameters — small enough to embed as
compile-time constants in the kernel, so a full evaluation episode
(obs assembly -> Dense -> GRU -> Dense -> RK4 dynamics -> reward ->
termination) runs for all T steps with every state, hidden-state, and
parameter tile resident in VMEM. The only HBM traffic is the initial state
in and the final state + per-env (alive, length, return) stats out.

This is the TPU-native form of the reference's eval rollouts (SURVEY §3.4
evaluation utils; §4.2 user loop): where the reference crosses the
Python<->C++ boundary twice per step per batch, this crosses no boundary at
all for an entire 500-step episode on 16k airframes.

Policy semantics match `policy.network` exactly (PyTorch-convention GRU,
gate order r,z,n, learned initial hidden state — SURVEY §A.2); parity is
tested in tests/test_pallas_eval.py against the XLA evaluate() path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raptor_tpu.env.types import DynamicsParams, RewardConfig, State
from raptor_tpu.ops.pallas_rollout import (
    LANES,
    N_PARAM,
    N_STATE,
    pack_params,
    pack_state,
    unpack_state,
)


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _policy_step(W, obs, h):
    """One policy step on tiles. W: dict of nested python-float lists
    (compile-time constants). obs: list of 22 tiles; h: list of 16 tiles.
    Returns (h_new [16 tiles], action [4 tiles])."""
    H = len(h)
    x = []
    for i in range(H):
        acc = W["b0"][i]
        for j, o in enumerate(obs):
            w = W["w0"][i][j]
            if w != 0.0:
                acc = acc + w * o
        x.append(jnp.maximum(acc, 0.0))
    # streaming per-unit GRU: each hidden unit's six accumulators are
    # consumed immediately, keeping the live tile set ~(x + h + h_new)
    # instead of 96 gate pre-activations — Mosaic register pressure is the
    # difference between vreg-resident and VMEM-spilled inner loops
    h_new = []
    for i in range(H):
        gi_r, gh_r = W["bi"][i], W["bh"][i]
        gi_z, gh_z = W["bi"][H + i], W["bh"][H + i]
        gi_n, gh_n = W["bi"][2 * H + i], W["bh"][2 * H + i]
        for j in range(H):
            xj, hj = x[j], h[j]
            gi_r = gi_r + W["wi"][i][j] * xj
            gh_r = gh_r + W["wh"][i][j] * hj
            gi_z = gi_z + W["wi"][H + i][j] * xj
            gh_z = gh_z + W["wh"][H + i][j] * hj
            gi_n = gi_n + W["wi"][2 * H + i][j] * xj
            gh_n = gh_n + W["wh"][2 * H + i][j] * hj
        r = _sigmoid(gi_r + gh_r)
        z = _sigmoid(gi_z + gh_z)
        n = jnp.tanh(gi_n + r * gh_n)
        h_new.append((1.0 - z) * n + z * h[i])
    action = []
    for i in range(len(W["b2"])):
        acc = W["b2"][i]
        for j in range(H):
            acc = acc + W["w2"][i][j] * h_new[j]
        action.append(jnp.clip(acc, -1.0, 1.0))
    return h_new, action


def _dyn_derivative(P, s, setpoint):
    """Same math as pallas_rollout._derivative (kept local: eval composes it
    with the policy obs tiles)."""
    from raptor_tpu.ops.pallas_rollout import _derivative

    return _derivative(P, s, setpoint)


def _obs_tiles(s, prev_action):
    """22 policy-observation tiles from state tiles: p(3), R row-major(9)
    from q, v(3), w(3), prev action(4) — matching env.quad.observe."""
    px, py, pz, qw, qx, qy, qz, vx, vy, vz, wx, wy, wz = s[:13]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    wx_, wy_, wz_ = qw * qx, qw * qy, qw * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    r = [
        1 - 2 * (yy + zz), 2 * (xy - wz_), 2 * (xz + wy_),
        2 * (xy + wz_), 1 - 2 * (xx + zz), 2 * (yz - wx_),
        2 * (xz - wy_), 2 * (yz + wx_), 1 - 2 * (xx + yy),
    ]
    return [px, py, pz] + r + [vx, vy, vz, wx, wy, wz] + list(prev_action)


def _hover_action_tiles(P):
    """Per-env hover command (for the action-cost reward term): solves
    T(u) = m g / 4 on tiles (mirror of dynamics.hover_action)."""
    c0, c1, c2 = P[35], P[36], P[37]
    target = P[0] * 9.81 / 4.0 - c0
    c2s = jnp.where(jnp.abs(c2) < 1e-8, 1e-8, c2)
    disc = jnp.sqrt(jnp.maximum(c1 * c1 + 4.0 * c2s * target, 0.0))
    u = jnp.where(
        jnp.abs(c2) < 1e-8,
        target / jnp.where(jnp.abs(c1) < 1e-8, 1e-8, c1),
        (-c1 + disc) / (2.0 * c2s),
    )
    u = jnp.clip(u, 0.0, 1.0)
    span = jnp.maximum(P[40] - P[39], 1e-6)
    return jnp.clip(2.0 * (u - P[39]) / span - 1.0, -1.0, 1.0)


def _eval_kernel(
    params_ref, state_ref, out_ref, stats_ref, *,
    W, n_steps, dt, pos_bound, angvel_bound, rw,
):
    P = [params_ref[i] for i in range(N_PARAM)]
    rpm_min, rpm_max = P[39], P[40]
    hover = _hover_action_tiles(P)
    state0 = tuple(state_ref[i] for i in range(N_STATE))
    # derive loop-carry inits from tile data (x*0), not from broadcast
    # constants: Mosaic gives constants a replicated layout, which cannot be
    # relaid out at the fori_loop boundary ("Invalid relayout ... replicated
    # in destination but not in source")
    zeros = state0[0] * 0.0
    h0 = tuple(zeros + W["h0"][i] for i in range(len(W["h0"])))
    prev0 = (zeros, zeros, zeros, zeros)
    carry0 = (state0, h0, prev0, zeros + 1.0, zeros, zeros)

    def step(_, carry):
        s, h, prev, alive, length, ret = carry
        obs = _obs_tiles(s, prev)
        h_new, action = _policy_step(W, obs, h)
        setpoint = tuple(
            rpm_min + (action[i] + 1.0) * 0.5 * (rpm_max - rpm_min)
            for i in range(4)
        )
        k1 = _dyn_derivative(P, s, setpoint)
        ax = lambda sc: tuple(si + sc * di for si, di in zip(s, k1)) # noqa
        k2 = _dyn_derivative(P, tuple(si + dt * 0.5 * di for si, di in zip(s, k1)), setpoint)
        k3 = _dyn_derivative(P, tuple(si + dt * 0.5 * di for si, di in zip(s, k2)), setpoint)
        k4 = _dyn_derivative(P, tuple(si + dt * di for si, di in zip(s, k3)), setpoint)
        s2 = tuple(
            si + (dt / 6.0) * (a + 2 * b + 2 * c + d)
            for si, a, b, c, d in zip(s, k1, k2, k3, k4)
        )
        qw, qx, qy, qz = s2[3], s2[4], s2[5], s2[6]
        inv_norm = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz)
        rpm = tuple(jnp.clip(s2[13 + i], 0.0, rpm_max) for i in range(4))
        s2 = (
            s2[0], s2[1], s2[2],
            qw * inv_norm, qx * inv_norm, qy * inv_norm, qz * inv_norm,
            s2[7], s2[8], s2[9], s2[10], s2[11], s2[12],
        ) + rpm

        # reward (env.quad.reward contract; constants are static)
        pos_cost = s2[0] * s2[0] + s2[1] * s2[1] + s2[2] * s2[2]
        orient_cost = 2.0 * (1.0 - jnp.abs(s2[3]))
        linvel_cost = s2[7] * s2[7] + s2[8] * s2[8] + s2[9] * s2[9]
        angvel_cost = s2[10] * s2[10] + s2[11] * s2[11] + s2[12] * s2[12]
        act_cost = sum((action[i] - hover) * (action[i] - hover) for i in range(4))
        reward = rw["scale"] * (
            rw["constant"]
            - rw["position_weight"] * pos_cost
            - rw["orientation_weight"] * orient_cost
            - rw["linear_velocity_weight"] * linvel_cost
            - rw["angular_velocity_weight"] * angvel_cost
            - rw["action_weight"] * act_cost
        )

        dead = (
            (jnp.abs(s2[0]) > pos_bound)
            | (jnp.abs(s2[1]) > pos_bound)
            | (jnp.abs(s2[2]) > pos_bound)
            | (angvel_cost > angvel_bound * angvel_bound)
        )
        alive2 = alive * (1.0 - dead.astype(alive.dtype))
        # reward for the step is earned while still alive at step start
        ret2 = ret + reward * alive
        length2 = length + alive
        s2 = tuple(a * alive2 + b * (1.0 - alive2) for a, b in zip(s2, s))
        h2 = tuple(a * alive2 + b * (1.0 - alive2) for a, b in zip(h_new, h))
        prev2 = tuple(a * alive2 + b * (1.0 - alive2) for a, b in zip(action, prev))
        return (s2, h2, prev2, alive2, length2, ret2)

    final, h, prev, alive, length, ret = jax.lax.fori_loop(
        0, n_steps, step, carry0
    )
    for i in range(N_STATE):
        out_ref[i] = final[i]
    stats_ref[0] = alive
    stats_ref[1] = length
    stats_ref[2] = ret


def _weights_to_constants(policy_params: Dict[str, Any]) -> dict:
    p = jax.tree.map(lambda x: np.asarray(x, np.float32), policy_params)
    return {
        "w0": p["dense_0"]["weights"].tolist(),
        "b0": p["dense_0"]["biases"].reshape(-1).tolist(),
        "wi": p["gru_1"]["weights_input"].tolist(),
        "wh": p["gru_1"]["weights_hidden"].tolist(),
        "bi": p["gru_1"]["biases_input"].tolist(),
        "bh": p["gru_1"]["biases_hidden"].tolist(),
        "h0": p["gru_1"]["initial_hidden_state"].tolist(),
        "w2": p["dense_2"]["weights"].tolist(),
        "b2": p["dense_2"]["biases"].reshape(-1).tolist(),
    }


def make_fused_policy_eval(
    policy_params: Dict[str, Any],
    n_steps: int,
    dt: float = 0.01,
    pos_bound: float = 0.6,
    angvel_bound: float = 35.0,
    reward_config: RewardConfig = RewardConfig(),
    block_rows: int = 64,
):
    """Build a JITTED closed-loop evaluator for one checkpoint.

    Returns fn(params [N], state [N]) -> (final State, alive, length,
    return). The ENTIRE pipeline (SoA pack -> kernel -> unpack) runs under
    one jit: eager packing costs dozens of per-op dispatches (catastrophic
    through a remote-device tunnel — measured 200x slowdown) and is the
    reason this factory exists. Weights are baked into the kernel as
    compile-time constants (recompile per checkpoint, ~seconds).
    """
    W = _weights_to_constants(policy_params)
    rw = {
        "scale": reward_config.scale,
        "constant": reward_config.constant,
        "position_weight": reward_config.position_weight,
        "orientation_weight": reward_config.orientation_weight,
        "linear_velocity_weight": reward_config.linear_velocity_weight,
        "angular_velocity_weight": reward_config.angular_velocity_weight,
        "action_weight": reward_config.action_weight,
    }

    @jax.jit
    def run(params: DynamicsParams, state: State):
        n = state.position.shape[0]
        pp = pack_params(params)
        sp = pack_state(state)
        rows = sp.shape[1]
        from raptor_tpu.ops.pallas_rollout import _fit_block_rows

        br = _fit_block_rows(rows, block_rows)
        grid = (rows // br,)

        def index_map(i):
            return (0, i, 0)

        kernel = functools.partial(
            _eval_kernel,
            W=W,
            n_steps=n_steps,
            dt=dt,
            pos_bound=pos_bound,
            angvel_bound=angvel_bound,
            rw=rw,
        )
        out, stats = pl.pallas_call(
            kernel,
            interpret=jax.default_backend() != "tpu",  # CPU fallback
            grid=grid,
            in_specs=[
                pl.BlockSpec((N_PARAM, br, LANES), index_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_STATE, br, LANES), index_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((N_STATE, br, LANES), index_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, br, LANES), index_map,
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(sp.shape, jnp.float32),
                jax.ShapeDtypeStruct((3,) + sp.shape[1:], jnp.float32),
            ),
        )(pp, sp)
        flat = stats.reshape(3, -1)
        return (
            unpack_state(out, n),
            flat[0, :n],
            flat[1, :n],
            flat[2, :n],
        )

    return run


def fused_policy_eval(
    policy_params: Dict[str, Any],
    params: DynamicsParams,  # [N]-stacked airframes
    state: State,  # [N]-stacked initial states
    n_steps: int,
    dt: float = 0.01,
    pos_bound: float = 0.6,
    angvel_bound: float = 35.0,
    reward_config: RewardConfig = RewardConfig(),
    block_rows: int = 64,
):
    """One-shot convenience over `make_fused_policy_eval` (build the jitted
    evaluator once and reuse it when calling repeatedly)."""
    run = make_fused_policy_eval(
        policy_params, n_steps, dt, pos_bound, angvel_bound, reward_config,
        block_rows,
    )
    return run(params, state)
