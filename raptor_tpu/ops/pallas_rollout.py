"""Pallas fused dynamics-rollout kernel — the framework's flagship hot op.

Why: the XLA path for the vectorized l2f step (SURVEY §3.3) materializes
[N,3]/[N,4,3]-shaped intermediates in HBM every step; profiling on a v5e
chip shows ~270M env-steps/s for pure RK4 — far below the VPU roofline.
This kernel runs the ENTIRE T-step rollout inside one `pallas_call`:

- struct-of-arrays layout: every state/param component is a [R, 128] f32
  tile (env index = (sublane, lane)), so all physics is perfectly
  lane-aligned VPU code with zero relayouts;
- all state + airframe parameters live in VMEM for the whole rollout — the
  only HBM traffic is the initial/final state (and the action schedule);
- `fori_loop` over T steps of RK4 (4 derivative evals, quaternion
  normalize, rotor-lag clip) exactly matching `env.dynamics.integrate`
  (parity-tested in tests/test_pallas_rollout.py).

Layouts (N envs padded to a multiple of 1024 = 8 sublanes x 128 lanes):
  state  [17, R, 128]: p(3) q(4) v(3) w(3, body) rpm(4)
  params [42, R, 128]: mass J(3) Jinv(3) rotor_pos(12) thrust_dir(12)
                       torque_sign(4) thrust_curve(3) kappa rpm_min rpm_max
                       motor_time_constant
  action [4,  R, 128]: held constant over the rollout (the collect loops
                       that interleave a policy use the XLA path; this
                       kernel is the raw-engine benchmark + burn-in path)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raptor_tpu.env.types import DynamicsParams, State

N_STATE = 17
N_PARAM = 42
LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # env-count granularity


# ---------------------------------------------------------------------------
# packing: pytree-of-[N] arrays <-> [C, R, 128] SoA blocks
# ---------------------------------------------------------------------------


def _pad(n: int) -> int:
    return -(-n // TILE) * TILE


def _fit_block_rows(rows: int, requested: int) -> int:
    """Largest divisor of `rows` not exceeding `requested` — a flooring
    grid (rows // block) would silently drop the tail env blocks."""
    b = min(requested, rows)
    while rows % b:
        b -= 1
    return b


def pack_state(state: State) -> jax.Array:
    """[N]-stacked State pytree -> [17, R, 128] f32."""
    n = state.position.shape[0]
    np_ = _pad(n)
    rows = jnp.concatenate(
        [
            state.position.T,  # [3, N]
            state.orientation.T,  # [4, N]
            state.linear_velocity.T,
            state.angular_velocity.T,
            state.rpm.T,
        ],
        axis=0,
    )
    rows = jnp.pad(rows, ((0, 0), (0, np_ - n)))
    if np_ > n:
        # dead lanes need a unit quaternion: (0,0,0,0) hits rsqrt(0) -> NaN
        # inside the kernel's renormalize and poisons reductions over tiles
        rows = rows.at[3, n:].set(1.0)
    return rows.reshape(N_STATE, np_ // LANES // SUBLANES * SUBLANES, LANES)


def unpack_state(packed: jax.Array, n: int) -> State:
    rows = packed.reshape(N_STATE, -1)[:, :n]
    return State(
        position=rows[0:3].T,
        orientation=rows[3:7].T,
        linear_velocity=rows[7:10].T,
        angular_velocity=rows[10:13].T,
        rpm=rows[13:17].T,
    )


def pack_params(params: DynamicsParams) -> jax.Array:
    """[N]-stacked DynamicsParams -> [42, R, 128] f32."""
    n = params.mass.shape[0]
    np_ = _pad(n)
    rows = jnp.concatenate(
        [
            params.mass[None],
            params.inertia_diag.T,
            params.inertia_diag_inv.T,
            params.rotor_positions.reshape(n, 12).T,
            params.rotor_thrust_directions.reshape(n, 12).T,
            params.rotor_torque_signs.T,
            params.thrust_curve.T,
            params.torque_constant[None],
            params.rpm_min[None],
            params.rpm_max[None],
            params.motor_time_constant[None],
        ],
        axis=0,
    )
    # pad with ones to keep 1/mass, 1/Tm finite in dead lanes
    rows = jnp.pad(rows, ((0, 0), (0, np_ - n)), constant_values=1.0)
    return rows.reshape(N_PARAM, np_ // LANES // SUBLANES * SUBLANES, LANES)


def pack_action(action: jax.Array) -> jax.Array:
    n = action.shape[0]
    np_ = _pad(n)
    rows = jnp.pad(action.T, ((0, 0), (0, np_ - n)))
    return rows.reshape(4, np_ // LANES // SUBLANES * SUBLANES, LANES)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _derivative(P, s, setpoint):
    """Component-tuple derivative. P: list of 42 [R,128] param tiles;
    s: tuple of 17 state tiles; setpoint: 4 tiles. Mirrors
    env.dynamics.derivative exactly."""
    (px, py, pz, qw, qx, qy, qz, vx, vy, vz, wx, wy, wz, u0, u1, u2, u3) = s
    mass = P[0]
    jx, jy, jz = P[1], P[2], P[3]
    jix, jiy, jiz = P[4], P[5], P[6]
    c0, c1, c2 = P[35], P[36], P[37]
    kappa = P[38]
    inv_tm = 1.0 / P[41]

    us = (u0, u1, u2, u3)
    fx = fy = fz = 0.0
    tx = ty = tz = 0.0
    for i in range(4):
        ui = us[i]
        ti = c0 + c1 * ui + c2 * ui * ui  # thrust magnitude
        rx, ry, rz = P[7 + 3 * i], P[8 + 3 * i], P[9 + 3 * i]
        dx, dy, dz = P[19 + 3 * i], P[20 + 3 * i], P[21 + 3 * i]
        sgn = P[31 + i]
        fxi, fyi, fzi = ti * dx, ti * dy, ti * dz
        fx, fy, fz = fx + fxi, fy + fyi, fz + fzi
        # r x F
        tx += ry * fzi - rz * fyi
        ty += rz * fxi - rx * fzi
        tz += rx * fyi - ry * fxi
        # reaction torque about thrust axis
        tx += sgn * kappa * ti * dx
        ty += sgn * kappa * ti * dy
        tz += sgn * kappa * ti * dz

    # rotate body force to world: t = 2*qv x F; Fw = F + qw*t + qv x t
    t2x = 2.0 * (qy * fz - qz * fy)
    t2y = 2.0 * (qz * fx - qx * fz)
    t2z = 2.0 * (qx * fy - qy * fx)
    fwx = fx + qw * t2x + (qy * t2z - qz * t2y)
    fwy = fy + qw * t2y + (qz * t2x - qx * t2z)
    fwz = fz + qw * t2z + (qx * t2y - qy * t2x)

    inv_m = 1.0 / mass
    dvx = fwx * inv_m
    dvy = fwy * inv_m
    dvz = fwz * inv_m - 9.81

    # dq = 0.5 * q ⊗ (0, w)
    dqw = 0.5 * (-qx * wx - qy * wy - qz * wz)
    dqx = 0.5 * (qw * wx + qy * wz - qz * wy)
    dqy = 0.5 * (qw * wy - qx * wz + qz * wx)
    dqz = 0.5 * (qw * wz + qx * wy - qy * wx)

    # dw = Jinv * (tau - w x (J w))
    hx, hy, hz = jx * wx, jy * wy, jz * wz
    dwx = jix * (tx - (wy * hz - wz * hy))
    dwy = jiy * (ty - (wz * hx - wx * hz))
    dwz = jiz * (tz - (wx * hy - wy * hx))

    du = tuple((setpoint[i] - us[i]) * inv_tm for i in range(4))

    return (vx, vy, vz, dqw, dqx, dqy, dqz, dvx, dvy, dvz, dwx, dwy, dwz) + du


def _axpy(s, d, h):
    return tuple(si + h * di for si, di in zip(s, d))


def _rollout_kernel(
    params_ref, state_ref, action_ref, out_ref, stats_ref, *,
    n_steps, dt, pos_bound, angvel_bound,
):
    P = [params_ref[i] for i in range(N_PARAM)]
    rpm_min, rpm_max = P[39], P[40]
    # action -> setpoint, computed once (action constant over the rollout)
    setpoint = tuple(
        rpm_min
        + (jnp.clip(action_ref[i], -1.0, 1.0) + 1.0) * 0.5 * (rpm_max - rpm_min)
        for i in range(4)
    )
    state0 = tuple(state_ref[i] for i in range(N_STATE))
    # carry inits derived from tile data (x*0), not broadcast constants —
    # Mosaic gives constants replicated layouts that cannot be relaid out
    # at the fori_loop boundary
    zeros = state0[0] * 0.0
    alive0 = zeros + 1.0
    length0 = zeros

    def step(_, carry):
        s, alive, length = carry
        k1 = _derivative(P, s, setpoint)
        k2 = _derivative(P, _axpy(s, k1, dt * 0.5), setpoint)
        k3 = _derivative(P, _axpy(s, k2, dt * 0.5), setpoint)
        k4 = _derivative(P, _axpy(s, k3, dt), setpoint)
        s2 = tuple(
            si + (dt / 6.0) * (a + 2.0 * b + 2.0 * c + d)
            for si, a, b, c, d in zip(s, k1, k2, k3, k4)
        )
        # quaternion renormalize
        qw, qx, qy, qz = s2[3], s2[4], s2[5], s2[6]
        inv_norm = jax.lax.rsqrt(qw * qw + qx * qx + qy * qy + qz * qz)
        rpm = tuple(jnp.clip(s2[13 + i], 0.0, rpm_max) for i in range(4))
        s2 = (
            s2[0], s2[1], s2[2],
            qw * inv_norm, qx * inv_norm, qy * inv_norm, qz * inv_norm,
            s2[7], s2[8], s2[9], s2[10], s2[11], s2[12],
        ) + rpm
        # termination (env.quad.terminated contract): freeze dead envs so
        # diverging trajectories can't overflow f32 over long rollouts
        wx, wy, wz = s2[10], s2[11], s2[12]
        out_of_bounds = (
            (jnp.abs(s2[0]) > pos_bound)
            | (jnp.abs(s2[1]) > pos_bound)
            | (jnp.abs(s2[2]) > pos_bound)
            | (wx * wx + wy * wy + wz * wz > angvel_bound * angvel_bound)
        )
        alive2 = alive * (1.0 - out_of_bounds.astype(alive.dtype))
        s2 = tuple(a * alive2 + b * (1.0 - alive2) for a, b in zip(s2, s))
        # pre-kill alive: the terminating step counts toward episode length
        # (matches pallas_eval and rl.evaluation semantics)
        return s2, alive2, length + alive

    final, alive, length = jax.lax.fori_loop(
        0, n_steps, step, (state0, alive0, length0)
    )
    for i in range(N_STATE):
        out_ref[i] = final[i]
    stats_ref[0] = alive
    stats_ref[1] = length


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "dt", "block_rows", "pos_bound", "angvel_bound"),
)
def fused_rollout_packed(
    params_packed: jax.Array,  # [42, R, 128]
    state_packed: jax.Array,  # [17, R, 128]
    action_packed: jax.Array,  # [4, R, 128]
    n_steps: int,
    dt: float = 0.01,
    block_rows: int = 128,  # envs per grid step = block_rows * 128
    pos_bound: float = 0.6,  # TerminationConfig defaults
    angvel_bound: float = 35.0,
):
    """Run n_steps of RK4 entirely on-chip with freeze-on-termination.

    Returns (final_state [17,R,128], stats [2,R,128]) where stats[0] = alive
    flag and stats[1] = per-env survived step count."""
    rows = state_packed.shape[1]
    block_rows = _fit_block_rows(rows, block_rows)
    grid = (rows // block_rows,)

    def index_map(i):
        return (0, i, 0)

    kernel = functools.partial(
        _rollout_kernel,
        n_steps=n_steps,
        dt=dt,
        pos_bound=pos_bound,
        angvel_bound=angvel_bound,
    )
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",  # CPU fallback for tests/CLI
        grid=grid,
        in_specs=[
            pl.BlockSpec((N_PARAM, block_rows, LANES), index_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_STATE, block_rows, LANES), index_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_rows, LANES), index_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N_STATE, block_rows, LANES), index_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_rows, LANES), index_map,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(state_packed.shape, jnp.float32),
            jax.ShapeDtypeStruct((2,) + state_packed.shape[1:], jnp.float32),
        ),
    )(params_packed, state_packed, action_packed)


@functools.partial(
    jax.jit, static_argnames=("n_steps", "dt", "pos_bound", "angvel_bound")
)
def fused_rollout(
    params: DynamicsParams,  # [N]-stacked
    state: State,  # [N]-stacked
    action: jax.Array,  # [N, 4] constant action
    n_steps: int,
    dt: float = 0.01,
    pos_bound: float = 0.6,
    angvel_bound: float = 35.0,
):
    """Convenience wrapper: pytree in -> (State, alive [N], length [N]).

    Jitted end-to-end: eager SoA packing costs dozens of per-op dispatches
    (catastrophic through a remote-device tunnel)."""
    n = state.position.shape[0]
    out, stats = fused_rollout_packed(
        pack_params(params),
        pack_state(state),
        pack_action(action),
        n_steps,
        dt,
        pos_bound=pos_bound,
        angvel_bound=angvel_bound,
    )
    flat = stats.reshape(2, -1)
    return unpack_state(out, n), flat[0, :n], flat[1, :n]
