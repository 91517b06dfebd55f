"""Golden-I/O parity: the first CI gate (SURVEY §7 Stage 0).

Loads the shipped reference checkpoint (ckpt.h5) and verifies our
Dense->GRU->Dense implementation reproduces example/output from
example/input to <=1e-5 (measured 8.3e-7 in the survey experiment §A.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.policy import Raptor, network, shipped_checkpoint_path


@pytest.fixture(scope="module")
def shipped():
    path = shipped_checkpoint_path()
    params = ckpt_h5.load_actor(path)
    ex_in, ex_out = ckpt_h5.load_example_io(path)
    return params, ex_in, ex_out


def test_golden_io_parity(shipped):
    params, ex_in, ex_out = shipped
    assert ex_in.shape == (500, 2, 22)
    assert ex_out.shape == (500, 2, 4)
    with jax.default_matmul_precision("highest"):
        _, actions = network.apply_sequence(params, jnp.asarray(ex_in))
    err = float(np.max(np.abs(np.asarray(actions) - ex_out)))
    assert err <= 1e-5, f"max abs err {err}"


def test_param_count(shipped):
    params, _, _ = shipped
    assert network.num_params(params) == 2084  # ckpt.h:40-186


def test_raptor_api_matches_sequence(shipped):
    """Stateful Raptor.evaluate_step == functional apply_sequence, stepwise."""
    params, ex_in, ex_out = shipped
    policy = Raptor(shipped_checkpoint_path(), batch_size=2)
    policy.reset()
    outs = []
    for t in range(20):
        outs.append(policy.evaluate_step(ex_in[t]))
    err = float(np.max(np.abs(np.stack(outs) - ex_out[:20])))
    assert err <= 1e-4, f"max abs err {err}"


def test_reset_restores_initial_hidden(shipped):
    params, ex_in, _ = shipped
    policy = Raptor(shipped_checkpoint_path(), batch_size=2)
    a0 = policy.evaluate_step(ex_in[0])
    policy.evaluate_step(ex_in[1])
    policy.reset()
    a0b = policy.evaluate_step(ex_in[0])
    np.testing.assert_allclose(a0, a0b, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, shipped):
    """save_actor -> load_actor roundtrip preserves params and self-verifies."""
    params, ex_in, ex_out = shipped
    out = str(tmp_path / "rt.h5")
    ckpt_h5.save_actor(out, params, ex_in, ex_out, checkpoint_name="rt-test")
    re = ckpt_h5.load_actor(out)
    for tree_a, tree_b in [(params, re)]:
        la, lb = jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt_h5.verify_checkpoint(out) <= 1e-5


def test_fresh_init_shapes():
    params = network.init_params(jax.random.key(0))
    assert network.num_params(params) == 2084
    h = network.initial_hidden(params, 3)
    _, a = network.apply_step(params, h, jnp.zeros((3, 22)))
    assert a.shape == (3, 4)
