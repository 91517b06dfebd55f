"""Failure-mode probe (round 4): cause attribution + snapshot mechanics.

The full app is TPU/CPU-heavy (256 envs x 500 steps); these tests pin the
pure summarize() logic and a tiny end-to-end probe on a handful of envs.
"""

import numpy as np
import jax

from raptor_tpu.apps import failure_modes
from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.policy import shipped_checkpoint_path


def test_summarize_cause_attribution():
    alive = np.array([1.0, 0.0, 0.0, 0.0])
    snap = dict(
        t=np.array([-1, 10, 400, 33]),
        pos_hit=np.array([False, True, False, True]),
        w_hit=np.array([False, False, True, True]),
        nonfinite=np.array([False, False, False, False]),
        z_exit=np.array([False, True, False, False]),
        z_sign=np.array([0.0, -1.0, 0.0, 0.0]),
        angle_at_term=np.array([0.0, 2.0, 0.5, 1.0]),
        w_norm=np.array([0.0, 3.0, 40.0, 36.0]),
    )
    out = failure_modes.summarize(alive, snap)
    assert out["episodes"] == 4 and out["terminated"] == 3
    assert abs(out["share_terminated"] - 0.75) < 1e-9
    assert abs(out["cause/position_only"] - 1 / 3) < 1e-9
    assert abs(out["cause/angular_only"] - 1 / 3) < 1e-9
    assert out["cause/z_down_given_z_exit"] == 1.0
    assert out["t_term/share_first_50"] == 2 / 3


def test_summarize_no_terminations():
    alive = np.ones(3)
    snap = dict(
        t=np.full(3, -1), pos_hit=np.zeros(3, bool), w_hit=np.zeros(3, bool),
        nonfinite=np.zeros(3, bool), z_exit=np.zeros(3, bool),
        z_sign=np.zeros(3), angle_at_term=np.zeros(3), w_norm=np.zeros(3),
    )
    out = failure_modes.summarize(alive, snap)
    assert out["terminated"] == 0 and "cause/position_box" not in out


def test_probe_tiny_runs_and_attributes():
    policy = ckpt_h5.load_actor(shipped_checkpoint_path())
    alive, snap = jax.jit(
        lambda k: failure_modes.probe(policy, 3.14159, k, 2, 2)
    )(jax.random.key(0))
    alive, snap = jax.tree.map(np.asarray, (alive, snap))
    assert alive.shape == (4,)
    died = snap["t"] >= 0
    # every dead env has a recorded cause and timestamp inside the episode
    assert np.all((alive < 0.5) == died)
    if died.any():
        causes = snap["pos_hit"] | snap["w_hit"] | snap["nonfinite"]
        assert np.all(causes[died])
        assert np.all(snap["t"][died] < 500)
