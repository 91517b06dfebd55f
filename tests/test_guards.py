"""Failure-detection subsystem: NaN guards + rollback recovery."""

import jax.numpy as jnp
import pytest

from raptor_tpu.rl import loop
from raptor_tpu.utils import guards


def test_nonfinite_detection():
    healthy = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert guards.nonfinite_leaves(healthy) == []
    sick = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, jnp.nan])}}
    bad = guards.nonfinite_leaves(sick)
    assert len(bad) == 1 and "c" in bad[0]
    with pytest.raises(FloatingPointError):
        guards.check_pytree(sick)


def test_failure_step_rolls_back():
    snapshots = []

    def super_step(state, params):
        new = state + 1.0
        metrics = {"loss": float("nan") if new == 5.0 else 1.0}
        return new, metrics

    # restore jumps back to the last good snapshot minus a perturbation
    # (deterministic replays would re-diverge; a real restore re-seeds)
    detector = guards.FailureDetectionStep(
        every_iters=1,
        snapshot_fn=lambda s: snapshots.append(s),
        restore_fn=lambda: snapshots[-1] + 0.5,
    )
    holder = loop.StateHolder(state=0.0, env_steps_per_iter=1)
    training = loop.Loop(loop.CoreStep(super_step, None), detector)
    for _ in range(10):
        training.step(holder)
    # hitting 5.0 produced NaN metrics -> rolled back to 4.0+0.5, training
    # continued past the bad region
    assert detector.restores == 1
    assert holder.state > 5.0
    assert snapshots  # healthy snapshots were taken


def test_failure_step_raises_without_restore():
    def super_step(state, params):
        return state + 1, {"loss": float("nan")}

    holder = loop.StateHolder(state=0, env_steps_per_iter=1)
    training = loop.Loop(
        loop.CoreStep(super_step, None),
        guards.FailureDetectionStep(every_iters=1),
    )
    with pytest.raises(guards.DivergenceError):
        for _ in range(3):
            training.step(holder)
