"""Diagnose the fused-collect kernel's real-TPU single-step error.

bench_collect v3 measured step-1 parity err 4.3e-4 on TPU (interpret mode:
1e-5) — gate threshold is 1e-4. This probe decomposes the error by obs
channel to attribute it to a kernel op class:

  ch 0-2   position        -> RK4 arithmetic
  ch 3-11  rotation matrix -> quaternion normalize (lax.rsqrt) + products
  ch 12-14 linear velocity -> RK4 arithmetic
  ch 15-17 angular velocity-> RK4 arithmetic
  ch 18-21 prev action     -> pure student GRU step (tanh/sigmoid/matvec)

Run on the real TPU (sole TPU process): python experiments/probe_collect_parity.py
"""

import json

import jax
import jax.numpy as jnp

from raptor_tpu.env import EnvConfig, L2F
from raptor_tpu.env.types import InitConfig, TerminationConfig
from raptor_tpu.ops.pallas_collect import make_fused_collect
from raptor_tpu.policy import network as student_net


def main():
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = EnvConfig(
        init=InitConfig(max_angle=0.2, linear_velocity_std=0.02,
                        angular_velocity_std=0.02),
        termination=TerminationConfig(position_bound=50.0,
                                      angular_velocity_bound=1000.0),
    )
    env = L2F(cfg)
    n = 1024
    student = student_net.init_params(jax.random.key(7))
    params = jax.vmap(env.sample_params)(
        jax.random.split(jax.random.key(5), n)
    )
    es, obs0 = jax.jit(jax.vmap(env.reset, in_axes=(0, 0)))(
        jax.random.split(jax.random.key(9), n), params
    )

    T = 4
    obs_f, reset_f = make_fused_collect(student, T, cfg, chunk=T)(
        params, es.dynamics, 3
    )

    _, v_step = env.vector_ops()
    h0 = student_net.initial_hidden(student, n)

    def body(carry, _):
        es, obs, h = carry
        h2, a = student_net.apply_step(student, h, obs[..., :22])
        es2, obs2, _, done, _ = v_step(params, es, jnp.clip(a, -1, 1))
        return (es2, obs2, h2), obs[..., :22]

    # XLA reference at BOTH matmul precisions: default rounds GRU matmul
    # inputs to bf16 on TPU; highest is the honest reference for the
    # kernel's exact f32 scalar-FMA policy step.
    ref = {}
    for prec in ("default", "highest"):
        with jax.default_matmul_precision(prec):
            _, ref[prec] = jax.jit(
                lambda es, obs0, h0: jax.lax.scan(
                    body, (es, obs0, h0), None, length=T)
            )(es, obs0, h0)
    obs_x = ref["highest"]

    groups = {
        "position(0-2)": slice(0, 3),
        "rotmat(3-11)": slice(3, 12),
        "linvel(12-14)": slice(12, 15),
        "angvel(15-17)": slice(15, 18),
        "prev_action(18-21)": slice(18, 22),
    }
    report = {"backend": jax.default_backend(), "steps": {}}
    for t in range(T):
        err = jnp.abs(obs_f[t] - obs_x[t])
        row = {k: float(jnp.max(err[:, sl])) for k, sl in groups.items()}
        row["max"] = float(jnp.max(err))
        report["steps"][f"t{t}"] = row
    report["xla_default_vs_highest_precision"] = {
        f"t{t}": float(jnp.max(jnp.abs(ref["default"][t] - ref["highest"][t])))
        for t in range(T)
    }
    report["resets_first_steps"] = float(jnp.sum(reset_f))
    print(json.dumps(report, indent=2))
    with open("artifacts/collect_parity_probe.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
