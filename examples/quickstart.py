"""Quickstart tour of raptor-tpu — runnable end to end on CPU or TPU.

    python examples/quickstart.py                       # default backend
    RAPTOR_PLATFORM=cpu python examples/quickstart.py   # force CPU
"""

import os
import sys

# script-by-path puts examples/ (not the repo root) on sys.path — make the
# documented `python examples/quickstart.py` work without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("RAPTOR_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["RAPTOR_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

# 1. Inference with the shipped foundation policy (reference README:16-25)
from raptor_tpu import Raptor

policy = Raptor(batch_size=2)
policy.reset()
obs = np.zeros((2, 22), np.float32)
action = policy.evaluate_step(obs)
print("1. Raptor action:", action.shape, action[0])

# 2. Vectorized domain-randomized environments
from raptor_tpu.env import EnvConfig, L2F, sample_population

env = L2F(EnvConfig())
n = 256
params = sample_population(jax.random.key(0), n)  # 256 random airframes
v_reset, v_step = env.vector_ops()
es, obs = v_reset(jax.random.split(jax.random.key(1), n), params)
step = jax.jit(v_step)
for _ in range(10):
    es, obs, reward, done, info = step(params, es, jnp.zeros((n, 4)))
print("2. vector env:", obs.shape, "reward mean", float(reward.mean()))

# 3. The same dynamics as one fused Pallas rollout (interpret mode off-TPU)
from raptor_tpu.ops.pallas_rollout import fused_rollout

final, alive, length = fused_rollout(
    params, es.dynamics, jnp.zeros((n, 4)), n_steps=20
)
print("3. fused rollout: mean survived steps", float(length.mean()))

# 4. A few SAC updates on the population
from raptor_tpu.rl import runner, sac

run_cfg = runner.RunnerConfig(
    n_envs=n, rollout_length=4, gradient_steps=4, batch_size=128,
    replay_capacity=256,
)
state = runner.trainer_init(jax.random.key(2), env, params, run_cfg, sac.SACConfig())
super_step = runner.make_super_step(env, run_cfg, sac.SACConfig())
state, metrics = super_step(state, params)
print("4. SAC super-step: critic loss", float(metrics.critic_loss))

# 5. Export the policy as a standalone C++ header (deployment path)
import tempfile, os
from raptor_tpu.checkpoint import code_export

with tempfile.TemporaryDirectory() as d:
    code_export.export_header_file(os.path.join(d, "policy.h"), policy.params)
    print("5. exported C++ header:", len(open(os.path.join(d, "policy.h")).readlines()), "lines")
