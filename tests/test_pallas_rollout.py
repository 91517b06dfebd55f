"""Pallas fused rollout: numerical parity vs the XLA dynamics path.

Runs in Pallas interpret mode on CPU (the TPU-compiled path is exercised by
bench.py on hardware)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.env import EnvConfig, L2F, sample_population
from raptor_tpu.ops import pallas_rollout as pr


@pytest.fixture(scope="module")
def setup():
    env = L2F(EnvConfig())
    n = 256
    params = sample_population(jax.random.key(0), n)
    v_reset, _ = env.vector_ops()
    es, _ = v_reset(jax.random.split(jax.random.key(1), n), params)
    return env, params, es.dynamics, n


def test_pack_unpack_roundtrip(setup):
    env, params, state, n = setup
    packed = pr.pack_state(state)
    assert packed.shape == (17, 8, 128)  # 256 envs padded to 1024
    back = pr.unpack_state(packed, n)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_matches_xla_rollout(setup):
    env, params, state, n = setup
    action = jnp.tile(jnp.asarray([0.1, -0.05, 0.02, 0.0]), (n, 1))

    # XLA reference: scan the per-step dynamics
    v_dyn = jax.vmap(lambda p, s, a: env.dynamics_step(p, s, a)[0])

    @functools.partial(jax.jit, static_argnames=("steps",))
    def xla_rollout(params, s, steps):
        def body(s, _):
            return v_dyn(params, s, action), None
        s, _ = jax.lax.scan(body, s, None, length=steps)
        return s

    steps = 20
    ref = xla_rollout(params, state, steps)

    # Pallas path in interpret mode (CPU test environment); disable the
    # in-kernel termination freeze so it matches the raw XLA integrator
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got, alive, length = pr.fused_rollout(
            params, state, action, steps, pos_bound=1e9, angvel_bound=1e9
        )
    assert np.all(np.asarray(alive) == 1.0)
    assert np.all(np.asarray(length) == steps)

    for name in ["position", "orientation", "linear_velocity",
                 "angular_velocity", "rpm"]:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3,
                                   err_msg=f"mismatch in {name}")
    # trajectories stay physical
    assert np.all(np.isfinite(np.asarray(got.position)))
    q_norm = np.linalg.norm(np.asarray(got.orientation), axis=-1)
    np.testing.assert_allclose(q_norm, 1.0, atol=1e-5)
