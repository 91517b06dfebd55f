"""Quaternion / rotation math for the rigid-body simulator.

Conventions (matching the reference l2f contract, SURVEY §1):
- FLU body frame (x forward, y left, z up), world frame z-up.
- Quaternion q = (w, x, y, z), Hamilton convention, rotates BODY -> WORLD.
- Rotation matrices row-major when flattened into observations.

All functions are scalar-per-env (no batch dim) and are `vmap`-ed by the
engine; they are written to stay fuseable elementwise VPU code under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotm(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w,x,y,z) -> 3x3 rotation matrix (body->world)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)]),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)]),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]),
        ]
    )


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, both (w,x,y,z)."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_derivative(q: jnp.ndarray, omega_body: jnp.ndarray) -> jnp.ndarray:
    """dq/dt = 0.5 * q ⊗ (0, ω_body) for body-frame angular velocity."""
    omega_quat = jnp.concatenate([jnp.zeros((1,), q.dtype), omega_body])
    return 0.5 * quat_mul(q, omega_quat)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q * jax_rsqrt(jnp.sum(q * q))


def jax_rsqrt(x):
    import jax.lax

    return jax.lax.rsqrt(x)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v (body) into world frame by unit quaternion q.

    Uses the 2-cross-product form (cheaper than building the matrix when the
    matrix isn't otherwise needed)."""
    qw, qv = q[0], q[1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])


def random_quaternion(key, max_angle: float = jnp.pi, angle_power: float = 1.0):
    """Random rotation up to max_angle about a uniform random axis.

    angle = max_angle * u^(1/angle_power): power 1.0 = uniform angle
    (reference distribution); power > 1 oversamples near-max angles
    (init-severity curriculum, see types.InitConfig.angle_power)."""
    import jax

    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    axis = axis * jax_rsqrt(jnp.sum(axis * axis) + 1e-12)
    u = jax.random.uniform(k2, ())
    if angle_power != 1.0:
        u = u ** (1.0 / angle_power)
    return quat_from_axis_angle(axis, u * max_angle)
