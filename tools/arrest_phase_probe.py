"""Round-5 probe: label-regime composition of the demonstrator's pi-start
recovery (the demoRate design evidence — docs/RESULTS.md round 5).

Rolls the scripted recovery controller (env/recovery.py) from uniform
full-attitude starts and classifies each visited state into the three
label regimes of the demo-injection labeler:

  severe  tilt > 1.2           -> demo label (tilt-only criterion)
  arrest  tilt < 1.2, |w| > 5  -> TEACHER label under tilt-only switching,
                                  demo label under --demo-rate 5
  calm    tilt < 1.2, |w| <= 5 -> teacher label

Run: RAPTOR_PLATFORM=cpu python experiments/probes/arrest_phase_probe.py
Writes artifacts/arrest_phase_probe.json.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.env import EnvConfig, L2F, sample_population
from raptor_tpu.env.recovery import recovery_action, tilt_angle
from raptor_tpu.env.types import InitConfig


def main():
    env = L2F(EnvConfig(init=InitConfig(max_angle=3.14159265)))
    m = 64
    params = sample_population(jax.random.key(7), 8)
    params = jax.tree.map(lambda x: jnp.repeat(x, 8, axis=0), params)
    v_reset, _ = env.vector_ops()
    v_dstep = jax.vmap(env.dynamics_step, in_axes=(0, 0, 0, 0))
    es, _ = v_reset(jax.random.split(jax.random.key(0), m), params)

    def body(carry, _):
        st, k = carry
        act = jax.vmap(recovery_action)(params, st)
        k, ks = jax.random.split(k)
        st2, _ = v_dstep(params, st, act, jax.random.split(ks, m))
        tilt = jax.vmap(tilt_angle)(st2.orientation)
        w = jnp.linalg.norm(st2.angular_velocity, axis=-1)
        return (st2, k), (tilt, w)

    (_, _), (tilt, w) = jax.lax.scan(
        body, (es.dynamics, jax.random.key(1)), None, length=150
    )
    tilt, w = np.asarray(tilt), np.asarray(w)
    sev = tilt > 1.2
    arrest = (~sev) & (w > 5.0)
    report = {
        "steps": 150, "envs": m,
        "share_severe_tilt_gt_1.2": float(sev.mean()),
        "share_arrest_tilt_lt_1.2_w_gt_5": float(arrest.mean()),
        "share_calm": float(((~sev) & (w <= 5.0)).mean()),
        "arrest_share_by_t": [float(arrest[t].mean()) for t in range(0, 40, 4)],
        "severe_share_by_t": [float(sev[t].mean()) for t in range(0, 40, 4)],
        "mean_w_by_t": [float(w[t].mean()) for t in range(0, 40, 4)],
    }
    print(json.dumps(report, indent=2))
    with open("artifacts/arrest_phase_probe.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
