"""CLI: real-flight evaluation tooling (L7).

TPU-framework counterpart of the reference's stripped flight-eval layer
(SURVEY §2 L7: pyvicon-datastream ingestion per reference
requirements.txt:1, MAVLink CSV logs per reference .gitignore:4-5). Three
modes over the shared flight-log CSV schema (`utils/flightlog.py`):

  record    fly a policy in the simulator and write the log a hardware
            bridge would have written (also documents the schema; use
            --hover-start for a deployment-like takeoff-from-rest)
  analyze   hover-performance metrics from a log: position/velocity RMSE,
            max excursion, tilt statistics, control smoothness, crash
            detection against the sim termination bounds
  replay    sim-to-real gap: integrate the logged actions through our
            dynamics from the logged initial state and report trajectory
            divergence (the system-identification health check)

    python -m raptor_tpu.apps.flight_eval record out.csv --shipped
    python -m raptor_tpu.apps.flight_eval analyze out.csv
    python -m raptor_tpu.apps.flight_eval replay out.csv --airframe crazyflie
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _metrics(log, pos_setpoint, env, params) -> dict:
    import jax
    import jax.numpy as jnp

    from raptor_tpu.env.types import State

    pos_err = log.position - np.asarray(pos_setpoint, np.float32)
    tilt = np.arccos(
        np.clip(1.0 - 2.0 * (log.orientation[:, 1] ** 2 + log.orientation[:, 2] ** 2),
                -1.0, 1.0)
    )
    # crash detection IS the simulator's termination predicate (position /
    # linear-velocity / angular-velocity bounds + non-finite states), vmapped
    # over the log rows — one source of truth, env/quad.py terminated()
    states = State(
        position=jnp.asarray(log.position),
        orientation=jnp.asarray(log.orientation),
        linear_velocity=jnp.asarray(log.linear_velocity),
        angular_velocity=jnp.asarray(log.angular_velocity),
        rpm=jnp.zeros((len(log.t_us), 4)),  # unobservable; unused by terminated
    )
    crashed = bool(
        jnp.any(jax.vmap(env.terminated, in_axes=(None, 0))(params, states))
    )
    out = {
        "duration_s": log.duration_s,
        "n_samples": int(len(log.t_us)),
        "rate_hz": (1.0 / log.dt_s) if log.dt_s > 0 else 0.0,
        "position_rmse_m": float(np.sqrt(np.mean(np.sum(pos_err**2, axis=1)))),
        "position_max_excursion_m": float(np.max(np.linalg.norm(pos_err, axis=1))),
        "velocity_rmse_mps": float(
            np.sqrt(np.mean(np.sum(log.linear_velocity**2, axis=1)))
        ),
        "tilt_mean_deg": float(np.degrees(np.mean(tilt))),
        "tilt_max_deg": float(np.degrees(np.max(tilt))),
        "crashed": crashed,
    }
    if log.action is not None:
        out["action_mean"] = [float(v) for v in np.mean(log.action, axis=0)]
        out["action_rate_rms"] = float(
            np.sqrt(np.mean(np.diff(log.action, axis=0) ** 2))
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=("record", "analyze", "replay"))
    p.add_argument("log", help="flight-log CSV path")
    p.add_argument("--checkpoint", default=None, help=".h5 policy (record)")
    p.add_argument("--shipped", action="store_true",
                   help="record with the shipped reference policy")
    p.add_argument("--airframe", choices=("crazyflie", "x500"),
                   default="crazyflie")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hover-start", action="store_true",
                   help="record from rest at the origin (deployment-like)")
    p.add_argument("--setpoint", type=float, nargs=3, default=(0.0, 0.0, 0.0))
    p.add_argument("--out", default=None, help="JSON report path (analyze/replay)")
    args = p.parse_args(argv)

    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from raptor_tpu.env import EnvConfig, L2F, presets
    from raptor_tpu.env.types import InitConfig
    from raptor_tpu.utils import flightlog

    params = getattr(presets, args.airframe)()
    env = L2F(EnvConfig(init=InitConfig(max_angle=0.0, position_range=0.0,
                                        linear_velocity_std=0.0,
                                        angular_velocity_std=0.0)
                        if args.hover_start else InitConfig(max_angle=0.5)))

    if args.mode == "record":
        from raptor_tpu.checkpoint import h5 as ckpt_h5
        from raptor_tpu.policy import network as student_net

        if args.shipped or not args.checkpoint:
            from raptor_tpu.policy import shipped_checkpoint_path

            args.checkpoint = shipped_checkpoint_path()
        policy = ckpt_h5.load_actor(args.checkpoint)
        es, _ = jax.jit(env.reset)(jax.random.key(args.seed), params)
        h = student_net.initial_hidden(policy, 1)
        dt_us = int(round(env.config.dt * 1e6))

        # manual closed loop (no auto-reset: a recorded flight must keep its
        # terminal out-of-bounds state in the log so `analyze` sees the
        # crash, and must never teleport through an episode truncation)
        @jax.jit
        def step_fn(state, prev_a, h):
            obs = env.observe(params, state, prev_a)
            h2, a = student_net.apply_step(policy, h[0], obs[:22])
            a = jnp.clip(a, -1.0, 1.0)
            s2, _ = env.dynamics_step(params, state, a)
            return s2, a, h2[None], env.terminated(params, s2)

        state = es.dynamics
        prev_a = jnp.zeros(4, jnp.float32)
        rows = []
        crashed_at = None
        for t in range(args.steps):
            s2, a, h, terminated = step_fn(state, prev_a, h)
            rows.append(
                (t * dt_us, np.asarray(state.position),
                 np.asarray(state.orientation),
                 np.asarray(state.linear_velocity),
                 np.asarray(state.angular_velocity), np.asarray(a))
            )
            state, prev_a = s2, a
            if bool(terminated):
                crashed_at = t + 1
                break
        # terminal state row (the crash frame, or the final hover state);
        # its action is the policy's command there — commanded, never
        # integrated, exactly what a real flight log's last frame holds
        obs_T = env.observe(params, state, prev_a)
        _, a_T = student_net.apply_step(policy, h[0], obs_T[:22])
        rows.append(
            (len(rows) * dt_us, np.asarray(state.position),
             np.asarray(state.orientation),
             np.asarray(state.linear_velocity),
             np.asarray(state.angular_velocity),
             np.asarray(jnp.clip(a_T, -1.0, 1.0)))
        )
        if crashed_at is not None:
            print(f"terminated at step {crashed_at}")
        log = flightlog.FlightLog(
            t_us=np.asarray([r[0] for r in rows], np.int64),
            position=np.stack([r[1] for r in rows]),
            orientation=np.stack([r[2] for r in rows]),
            linear_velocity=np.stack([r[3] for r in rows]),
            angular_velocity=np.stack([r[4] for r in rows]),
            action=np.stack([r[5] for r in rows]),
        )
        flightlog.write_csv(args.log, log)
        print(f"{args.log}: {len(rows)} samples, {log.duration_s:.2f} s")
        return

    log = flightlog.read_csv(args.log)
    if args.mode == "analyze":
        report = _metrics(log, args.setpoint, env, params)
    else:  # replay: sim-to-real gap from logged actions
        if log.action is None:
            raise SystemExit("replay requires action columns in the log")
        from raptor_tpu.env import dynamics
        from raptor_tpu.env.types import State

        state = State(
            position=jnp.asarray(log.position[0]),
            orientation=jnp.asarray(log.orientation[0]),
            linear_velocity=jnp.asarray(log.linear_velocity[0]),
            angular_velocity=jnp.asarray(log.angular_velocity[0]),
            # rotor speeds are unobservable in mocap logs; start from the
            # hover point like the env's own rpm_at_hover initial state
            rpm=jnp.broadcast_to(dynamics.hover_rpm(params), (4,)),
        )

        @jax.jit
        def roll(state, actions):
            def body(s, a):
                s2, _ = env.dynamics_step(params, s, a)
                return s2, s2.position

            return jax.lax.scan(body, state, actions)

        _, sim_pos = roll(state, jnp.asarray(log.action[:-1]))
        div = np.linalg.norm(np.asarray(sim_pos) - log.position[1:], axis=1)
        steps_1s = max(1, int(round(1.0 / env.config.dt)))
        report = {
            "n_steps": int(len(div)),
            "divergence_mean_m": float(np.mean(div)),
            "divergence_final_m": float(div[-1]),
            "divergence_at_1s_m": float(div[min(steps_1s - 1, len(div) - 1)]),
        }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
