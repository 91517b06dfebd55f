"""Scaling-measurement harness (VERDICT r2 item 4): the sharded population
super-step times correctly at N=1 and N=2 on the virtual test mesh and the
product scaling_report math is what the artifact run emits."""

import argparse

import jax

from raptor_tpu.apps import bench_scaling
from raptor_tpu.parallel.multihost import scaling_report


def _args(**over):
    base = dict(
        teachers_per_device=2, envs_per_teacher=4, rollout_length=4,
        gradient_steps=2, batch_size=16, replay_capacity=32,
        iters_lo=2, iters_hi=6,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_worker_measures_sharded_super_step():
    assert len(jax.devices()) >= 2  # conftest forces the 8-device mesh
    r1 = bench_scaling._worker(1, _args())
    r2 = bench_scaling._worker(2, _args())
    assert r1["devices"] == 1 and r1["teachers"] == 2
    assert r2["devices"] == 2 and r2["teachers"] == 4
    assert r2["env_steps_per_call"] == 2 * r1["env_steps_per_call"]
    assert r1["env_steps_per_s"] > 0 and r2["env_steps_per_s"] > 0


def test_scaling_report_math():
    rep = scaling_report(100.0, 160.0, 2)
    assert rep["devices"] == 2
    assert abs(rep["scaling_efficiency"] - 0.8) < 1e-9
    assert scaling_report(0.0, 10.0, 2)["scaling_efficiency"] == 0.0
