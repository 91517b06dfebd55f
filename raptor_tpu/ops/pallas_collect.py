"""Fused DAgger-collect rollout: the distillation data-collection loop in one
Pallas kernel (VERDICT r1 next-round item 4).

The distillation hot loop rolls the STUDENT policy (the 2k-param GRU
foundation network) across the whole teacher-airframe population and records
every visited observation for relabeling.  The XLA path
(`distill.post_training.make_collect`) dispatches env+GRU+teacher graphs per
step; this kernel runs the entire T-step closed loop — obs assembly -> GRU
student -> RK4 dynamics -> termination -> in-kernel episode auto-reset —
with all state resident in VMEM, streaming only the [T, N, 22] observation
sequence (+ reset mask) back to HBM through the Pallas output pipeline.

Teacher labels are NOT computed in-kernel: the privileged tail of the
observation is a static per-airframe function, so labeling is deferred to
one big MXU-batched matmul pass over the recorded sequences
(`distill.post_training.make_relabel`) — far better use of the MXU than
per-step MLP dispatch.  This factorization is exact (not an approximation)
whenever the executed action is the student's, i.e. the DAgger
teacher-mix beta == 0 (all but the first few rounds).

Auto-reset semantics mirror `env.quad.L2F.step` (reference l2f contract,
README:94-101): on termination OR per-env episode-length truncation the env
resamples a fresh initial state (uniform box position, uniform axis-angle
attitude up to max_angle, Gaussian velocities, rotors at hover), the
student's hidden state restarts at its learned h0, and the action history
zeroes.  Mid-rollout resets draw from a counter-based in-kernel hash PRNG
(lowbias32) — platform-independent (works compiled on TPU and in interpret
mode on CPU, where pltpu.prng_* is unavailable), deterministic in
(seed, env index, step).

The kernel integrates DETERMINISTIC dynamics: the optional per-step
stochastic disturbance forces/torques of `quad.dynamics_step` are not
modeled.  `distill.post_training.fused_collect_round` rejects airframes
with nonzero disturbance stds (the default randomization samples them 0).

Parity vs the XLA path is pinned by tests/test_pallas_collect.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raptor_tpu.env.types import (
    DynamicsParams,
    EnvConfig,
    State,
)
from raptor_tpu.ops.pallas_eval import _obs_tiles
from raptor_tpu.ops.pallas_rollout import (
    LANES,
    N_PARAM,
    N_STATE,
    _derivative,
    _fit_block_rows,
    pack_params,
    pack_state,
)

OBS_CH = 22  # policy observation channels recorded
OUT_CH = OBS_CH + 1  # + reset mask channel


# ---------------------------------------------------------------------------
# student weights as an SMEM operand vector (NOT compile-time constants):
# the student changes every DAgger round, and baked constants would force a
# fresh Mosaic compile per round (~2 s x 160 rounds, and a persistent-cache
# miss each time).  2,084 scalars in SMEM keep ONE compiled kernel for the
# whole run; each weight is a scalar SMEM read broadcast against env tiles,
# the same FMA count as the baked form.
# ---------------------------------------------------------------------------


def _policy_sizes(policy_params):
    H = int(policy_params["gru_1"]["initial_hidden_state"].shape[-1])
    obs_dim = int(policy_params["dense_0"]["weights"].shape[-1])
    return H, obs_dim


def flatten_policy(policy_params) -> jnp.ndarray:
    """Pack the student GRU policy into one (1, P) f32 vector with the fixed
    layout the kernel indexes: w0 [H,O] . b0 [H] . wi [3H,H] . wh [3H,H] .
    bi [3H] . bh [3H] . h0 [H] . w2 [4,H] . b2 [4]."""
    p = policy_params
    parts = [
        p["dense_0"]["weights"].reshape(-1),
        p["dense_0"]["biases"].reshape(-1),
        p["gru_1"]["weights_input"].reshape(-1),
        p["gru_1"]["weights_hidden"].reshape(-1),
        p["gru_1"]["biases_input"].reshape(-1),
        p["gru_1"]["biases_hidden"].reshape(-1),
        p["gru_1"]["initial_hidden_state"].reshape(-1),
        p["dense_2"]["weights"].reshape(-1),
        p["dense_2"]["biases"].reshape(-1),
    ]
    return jnp.concatenate(
        [jnp.asarray(x, jnp.float32) for x in parts]
    ).reshape(1, -1)


def _w_offsets(H: int, O: int):
    off = {}
    cur = 0
    for name, size in (
        ("w0", H * O), ("b0", H), ("wi", 3 * H * H), ("wh", 3 * H * H),
        ("bi", 3 * H), ("bh", 3 * H), ("h0", H), ("w2", 4 * H), ("b2", 4),
    ):
        off[name] = cur
        cur += size
    off["_total"] = cur
    return off


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _policy_step_smem(w_ref, off, H, O, obs, h):
    """One policy step on tiles, weights read as scalars from SMEM.

    Mirrors pallas_eval._policy_step (streaming per-unit GRU, PyTorch r,z,n
    gate order — SURVEY §A.2) with w_ref[0, idx] scalar loads in place of
    baked constants."""
    W0, B0 = off["w0"], off["b0"]
    WI, WH, BI, BH = off["wi"], off["wh"], off["bi"], off["bh"]
    W2, B2 = off["w2"], off["b2"]
    x = []
    for i in range(H):
        acc = w_ref[0, B0 + i]
        for j in range(O):
            acc = acc + w_ref[0, W0 + i * O + j] * obs[j]
        x.append(jnp.maximum(acc, 0.0))
    h_new = []
    for i in range(H):
        gi_r, gh_r = w_ref[0, BI + i], w_ref[0, BH + i]
        gi_z, gh_z = w_ref[0, BI + H + i], w_ref[0, BH + H + i]
        gi_n, gh_n = w_ref[0, BI + 2 * H + i], w_ref[0, BH + 2 * H + i]
        for j in range(H):
            xj, hj = x[j], h[j]
            gi_r = gi_r + w_ref[0, WI + i * H + j] * xj
            gh_r = gh_r + w_ref[0, WH + i * H + j] * hj
            gi_z = gi_z + w_ref[0, WI + (H + i) * H + j] * xj
            gh_z = gh_z + w_ref[0, WH + (H + i) * H + j] * hj
            gi_n = gi_n + w_ref[0, WI + (2 * H + i) * H + j] * xj
            gh_n = gh_n + w_ref[0, WH + (2 * H + i) * H + j] * hj
        r = _sigmoid(gi_r + gh_r)
        z = _sigmoid(gi_z + gh_z)
        n = jnp.tanh(gi_n + r * gh_n)
        h_new.append((1.0 - z) * n + z * h[i])
    action = []
    for i in range(4):
        acc = w_ref[0, B2 + i]
        for j in range(H):
            acc = acc + w_ref[0, W2 + i * H + j] * h_new[j]
        action.append(jnp.clip(acc, -1.0, 1.0))
    return h_new, action


# ---------------------------------------------------------------------------
# in-kernel PRNG: lowbias32 hash on uint32 tiles (fixed shifts only — TPU
# VPU and CPU interpret mode both lower these)
# ---------------------------------------------------------------------------


def _lowbias32(x):
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _uniform(ctr, draw_id):
    """U(0, 1) tile from a per-env counter tile and a static draw id."""
    bits = _lowbias32(ctr + jnp.uint32(0x9E3779B9) * jnp.uint32(draw_id))
    # 24 mantissa-exact bits; offset keeps log() finite. Mosaic has no
    # uint32->float32 lowering, so route through int32 (top 8 bits are
    # shifted off, so the value fits exactly and stays non-negative).
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24)
    ) + (0.5 / (1 << 24))


def _normal_pair(ctr, draw_id):
    """Two N(0,1) tiles (Box-Muller) from draws draw_id and draw_id+1."""
    u1 = _uniform(ctr, draw_id)
    u2 = _uniform(ctr, draw_id + 1)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = (2.0 * jnp.pi) * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def _hover_u_tiles(P):
    """Per-env hover rotor speed u in [0,1] (mirror of dynamics.hover_rpm)."""
    c0, c1, c2 = P[35], P[36], P[37]
    target = P[0] * 9.81 / 4.0 - c0
    c2s = jnp.where(jnp.abs(c2) < 1e-8, 1e-8, c2)
    disc = jnp.sqrt(jnp.maximum(c1 * c1 + 4.0 * c2s * target, 0.0))
    u = jnp.where(
        jnp.abs(c2) < 1e-8,
        target / jnp.where(jnp.abs(c1) < 1e-8, 1e-8, c1),
        (-c1 + disc) / (2.0 * c2s),
    )
    return jnp.clip(u, 0.0, 1.0)


def _sample_state_tiles(P, ctr, init):
    """Fresh initial-state tiles (mirror of env.quad.L2F.sample_state).

    init is a dict of static floats from InitConfig. Returns 17 state tiles.
    """
    pr = init["position_range"]
    pos = [(_uniform(ctr, d) * 2.0 - 1.0) * pr for d in range(3)]
    # uniform random axis (3 normals, normalized) + uniform angle
    ax, ay = _normal_pair(ctr, 3)
    az, _ = _normal_pair(ctr, 5)
    inv = jax.lax.rsqrt(ax * ax + ay * ay + az * az + 1e-12)
    u_angle = _uniform(ctr, 7)
    if init["angle_power"] != 1.0:
        # severity-biased draw u^(1/p) (types.InitConfig.angle_power) via
        # exp/log — _uniform is bounded away from 0 so log() is finite.
        # Guarded by the static != 1.0 check so the default program (and
        # its persistent-cache entry) is byte-identical to round 3's.
        u_angle = jnp.exp(jnp.log(u_angle) * (1.0 / init["angle_power"]))
    angle = u_angle * init["max_angle"]
    half = angle * 0.5
    s, c = jnp.sin(half), jnp.cos(half)
    quat = (c, ax * inv * s, ay * inv * s, az * inv * s)
    v1, v2 = _normal_pair(ctr, 8)
    v3, w1 = _normal_pair(ctr, 10)
    w2, w3 = _normal_pair(ctr, 12)
    lv = [v1 * init["lv_std"], v2 * init["lv_std"], v3 * init["lv_std"]]
    av = [w1 * init["av_std"], w2 * init["av_std"], w3 * init["av_std"]]
    if init["rpm_at_hover"]:
        rpm = _hover_u_tiles(P)
    else:
        rpm = P[39]  # rpm_min
    return tuple(pos) + quat + tuple(lv) + tuple(av) + (rpm, rpm, rpm, rpm)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _collect_kernel(
    seed_ref, w_ref, params_ref, state_ref, out_ref, carry_ref, *,
    H, O, off, chunk, dt, episode_length, pos_bound, linvel_bound,
    angvel_bound, init, br,
):
    i, t = pl.program_id(0), pl.program_id(1)
    P = [params_ref[c] for c in range(N_PARAM)]
    rpm_min, rpm_max = P[39], P[40]

    # unique per-env uint32 id tile (global row block offset + lane position).
    # env_offset globalizes the id under shard_map: program ids are
    # SHARD-LOCAL, so without the offset every device would reproduce the
    # same auto-reset randomization stream (shard k passes k * envs_per_shard)
    env_offset = seed_ref[0, 1]
    sub = jax.lax.broadcasted_iota(jnp.uint32, (br, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (br, LANES), 1)
    env_id = (
        jnp.uint32(env_offset)
        + (jnp.uint32(i) * jnp.uint32(br) + sub) * jnp.uint32(LANES)
        + lane
    )

    @pl.when(t == 0)
    def _():
        for c in range(N_STATE):
            carry_ref[c] = state_ref[c]
        zeros = state_ref[0] * 0.0
        for c in range(H):
            carry_ref[N_STATE + c] = zeros + w_ref[0, off["h0"] + c]
        for c in range(4):
            carry_ref[N_STATE + H + c] = zeros
        carry_ref[N_STATE + H + 4] = zeros  # per-env step counter

    s = tuple(carry_ref[c] for c in range(N_STATE))
    h = tuple(carry_ref[N_STATE + c] for c in range(H))
    prev = tuple(carry_ref[N_STATE + H + c] for c in range(4))
    tcount = carry_ref[N_STATE + H + 4]
    seed = seed_ref[0, 0]

    def step(k, carry):
        s, h, prev, tcount = carry
        obs = _obs_tiles(s, prev)
        h_new, action = _policy_step_smem(w_ref, off, H, O, obs, h)
        for c in range(OBS_CH):
            out_ref[c, pl.ds(k, 1)] = obs[c][None]
        setpoint = tuple(
            rpm_min + (action[c] + 1.0) * 0.5 * (rpm_max - rpm_min)
            for c in range(4)
        )
        k1 = _derivative(P, s, setpoint)
        k2 = _derivative(
            P, tuple(si + dt * 0.5 * di for si, di in zip(s, k1)), setpoint
        )
        k3 = _derivative(
            P, tuple(si + dt * 0.5 * di for si, di in zip(s, k2)), setpoint
        )
        k4 = _derivative(
            P, tuple(si + dt * di for si, di in zip(s, k3)), setpoint
        )
        s2 = tuple(
            si + (dt / 6.0) * (a + 2 * b + 2 * c_ + d)
            for si, a, b, c_, d in zip(s, k1, k2, k3, k4)
        )
        qw, qx, qy, qz = s2[3], s2[4], s2[5], s2[6]
        inv_norm = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz)
        rpm = tuple(jnp.clip(s2[13 + c], 0.0, rpm_max) for c in range(4))
        s2 = (
            s2[0], s2[1], s2[2],
            qw * inv_norm, qx * inv_norm, qy * inv_norm, qz * inv_norm,
            s2[7], s2[8], s2[9], s2[10], s2[11], s2[12],
        ) + rpm

        angvel_sq = s2[10] * s2[10] + s2[11] * s2[11] + s2[12] * s2[12]
        linvel_sq = s2[7] * s2[7] + s2[8] * s2[8] + s2[9] * s2[9]
        nonfinite = (s2[0] != s2[0]) | (s2[1] != s2[1]) | (s2[2] != s2[2])
        terminated = (
            (jnp.abs(s2[0]) > pos_bound)
            | (jnp.abs(s2[1]) > pos_bound)
            | (jnp.abs(s2[2]) > pos_bound)
            | (linvel_sq > linvel_bound * linvel_bound)
            | (angvel_sq > angvel_bound * angvel_bound)
            | nonfinite
        )
        t2 = tcount + 1.0
        truncated = t2 > (episode_length - 0.5)
        done_b = terminated | truncated
        out_ref[OBS_CH, pl.ds(k, 1)] = done_b.astype(s2[0].dtype)[None]

        # fresh sample where done (auto-reset, mirror of L2F.step); boolean
        # select (NOT arithmetic masking) so a non-finite terminated state is
        # actually replaced — NaN * 0.0 is NaN and would otherwise stick
        s_abs = t * chunk + k
        ctr = _lowbias32(
            env_id
            ^ (jnp.uint32(seed) * jnp.uint32(0x85EBCA6B))
            ^ (s_abs.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
        ) * jnp.uint32(31)
        fresh = _sample_state_tiles(P, ctr, init)
        s3 = tuple(jnp.where(done_b, f, a) for f, a in zip(fresh, s2))
        # tcount is always finite; s2 may be NaN (NaN * 0 = NaN)
        fin_zero = tcount * 0.0
        h3 = tuple(
            jnp.where(done_b, fin_zero + w_ref[0, off["h0"] + c], h_new[c])
            for c in range(H)
        )
        prev3 = tuple(jnp.where(done_b, 0.0, a) for a in action)
        t3 = jnp.where(done_b, 0.0, t2)
        return (s3, h3, prev3, t3)

    s, h, prev, tcount = jax.lax.fori_loop(
        0, chunk, step, (s, h, prev, tcount)
    )
    for c in range(N_STATE):
        carry_ref[c] = s[c]
    for c in range(H):
        carry_ref[N_STATE + c] = h[c]
    for c in range(4):
        carry_ref[N_STATE + H + c] = prev[c]
    carry_ref[N_STATE + H + 4] = tcount


@functools.lru_cache(maxsize=8)
def _make_runner(
    H: int, O: int, n_steps: int, config: EnvConfig, chunk: int,
    block_rows: int,
):
    """One jitted runner per (network size, env config, rollout shape) —
    weights flow in as an operand, so every DAgger round reuses the same
    compiled kernel (jit cache hit; no per-round Mosaic compile)."""
    init = {
        "position_range": config.init.position_range,
        "max_angle": config.init.max_angle,
        "angle_power": config.init.angle_power,
        "lv_std": config.init.linear_velocity_std,
        "av_std": config.init.angular_velocity_std,
        "rpm_at_hover": config.init.rpm_at_hover,
    }
    off = _w_offsets(H, O)
    n_chunks = n_steps // chunk

    @jax.jit
    def run(wflat, params: DynamicsParams, state0: State, seed, env_offset):
        n = state0.position.shape[0]
        pp = pack_params(params)
        sp = pack_state(state0)
        rows = sp.shape[1]
        br = _fit_block_rows(rows, block_rows)
        grid = (rows // br, n_chunks)
        kernel = functools.partial(
            _collect_kernel,
            H=H,
            O=O,
            off=off,
            chunk=chunk,
            dt=config.dt,
            episode_length=float(config.episode_length),
            pos_bound=config.termination.position_bound,
            linvel_bound=config.termination.linear_velocity_bound,
            angvel_bound=config.termination.angular_velocity_bound,
            init=init,
            br=br,
        )
        out = pl.pallas_call(
            kernel,
            interpret=jax.default_backend() != "tpu",  # CPU fallback
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2), lambda i, t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, off["_total"]), lambda i, t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((N_PARAM, br, LANES), lambda i, t: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_STATE, br, LANES), lambda i, t: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (OUT_CH, chunk, br, LANES), lambda i, t: (0, t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (OUT_CH, n_steps, rows, LANES), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((N_STATE + H + 4 + 1, br, LANES), jnp.float32)
            ],
        )(
            jnp.stack(
                [jnp.asarray(seed, jnp.int32),
                 jnp.asarray(env_offset, jnp.int32)]
            ).reshape(1, 2),
            wflat, pp, sp,
        )
        flat = out.reshape(OUT_CH, n_steps, rows * LANES)[:, :, :n]
        obs = jnp.transpose(flat[:OBS_CH], (1, 2, 0))  # [T, N, 22]
        reset = flat[OBS_CH]  # [T, N]
        return obs, reset

    return run


def make_fused_collect(
    student_params: Dict[str, Any],
    n_steps: int,
    config: EnvConfig = EnvConfig(),
    chunk: int = 10,
    block_rows: int = 8,
):
    """Fused collect for one student checkpoint.

    Returns fn(params [N], state0 [N], seed int32, env_offset int32 = 0) ->
    (obs [T, N, 22] f32, reset [T, N] f32).  The observation stream is
    pipelined to HBM by blocking the grid over (env rows, time chunks) with
    the loop carry persisted in VMEM scratch across time chunks; student
    weights are an SMEM operand so repeated calls with updated weights reuse
    one compiled kernel.

    env_offset globalizes the in-kernel PRNG env ids under shard_map: pass
    `jax.lax.axis_index(axis) * envs_per_shard` (shard sizes must be a
    multiple of LANES=128) and the sharded run reproduces the unsharded
    auto-reset stream exactly (tests/test_pallas_collect.py pins this).
    """
    assert n_steps % chunk == 0, "n_steps must be a multiple of chunk"
    assert config.observation.action_history_length == 1
    assert config.observation.angular_velocity_delay == 0
    H, O = _policy_sizes(student_params)
    wflat = flatten_policy(student_params)
    runner = _make_runner(H, O, n_steps, config, chunk, block_rows)
    return lambda params, state0, seed, env_offset=0: runner(
        wflat, params, state0, seed, env_offset
    )
