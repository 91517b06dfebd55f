"""End-to-end pipeline test: sample dynamics -> pre-train teachers ->
post-train (distill) -> exported checkpoint self-verifies.

This is the whole reference workflow (README:206-216) at toy scale, through
the actual CLI entry points.
"""

import glob
import json
import os

import numpy as np
import pytest

from raptor_tpu.apps import post_training as post_app
from raptor_tpu.apps import pre_training as pre_app
from raptor_tpu.apps import sample_dynamics as sample_app
from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.env.io import load_params_json
from raptor_tpu.utils import tfevents


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    os.chdir(tmp_path)

    # 1. sample airframe population
    sample_app.main(["--n", "3", "--out", "dynamics_parameters", "--seed", "5"])
    jsons = sorted(glob.glob("dynamics_parameters/*.json"))
    assert len(jsons) == 3
    params = load_params_json(jsons[0])
    assert params.mass.shape == ()

    # 2. pre-train teachers on those airframes (tiny budget)
    manifest = pre_app.main(
        [*jsons, "--envs-per-teacher", "8", "--super-steps", "3",
         "--eval-every", "2", "--experiments-dir", "experiments"]
    )
    assert os.path.exists(manifest)
    teacher_ckpts = open(manifest).read().split()
    assert len(teacher_ckpts) == 3
    actor = ckpt_h5.load_mlp_actor(teacher_ckpts[0])
    assert len(actor["layers"]) == 3

    # 3. post-train (distill) into the GRU student — through the round-3
    # recipe surface: per-round teacher subsampling, obs standardization
    # (folded on export), loss diagnostics, aggregated DAgger reservoir
    student_path = post_app.main(
        [manifest, "--rounds", "3", "--envs-per-teacher", "4",
         "--teachers-per-round", "2", "--standardize", "--diagnostics",
         "--aggregate-capacity", "16", "--grad-steps-per-round", "4",
         "--batch-size", "4",
         "--eval-every-rounds", "1", "--experiments-dir", "experiments"]
    )
    assert os.path.exists(student_path)

    # 4. the exported checkpoint self-verifies and has reference schema
    err = ckpt_h5.verify_checkpoint(student_path)
    assert err <= 1e-5
    student = ckpt_h5.load_actor(student_path)
    assert student["gru_1"]["weights_input"].shape == (48, 16)

    # 5. tfevents carry the reference's tags
    run_dir = os.path.dirname(os.path.dirname(student_path))
    events = glob.glob(os.path.join(run_dir, "events.out.tfevents.*"))
    assert events
    out = tfevents.read_scalars(events[0])
    assert "loss" in out and len(out["loss"]) >= 2
    assert "evaluation/return/mean" in out
    assert "crazyflie/return/mean" in out
    assert "diagnostics/loss_fresh" in out
    assert "diagnostics/teacher_disagreement" in out
    assert np.isfinite([v for _, v in out["loss"]]).all()

    # 6. config snapshots exist (extrack contract)
    assert glob.glob("experiments/*/*/config.json")


@pytest.mark.slow
def test_periodic_teacher_export_overwrites_in_place(tmp_path):
    """--checkpoint-every exports the population mid-training (hang/kill
    insurance): with cadence 1 the export runs every super-step, so the
    final files are the result of repeated in-place overwrites and the
    manifest (written via tmp+rename) must stay complete and loadable."""
    os.chdir(tmp_path)
    manifest = pre_app.main(
        ["--population", "2", "--envs-per-teacher", "4", "--super-steps", "2",
         "--eval-every", "0", "--checkpoint-every", "1",
         "--experiments-dir", "experiments"]
    )
    paths = open(manifest).read().split()
    assert len(paths) == 2
    for p in paths:
        actor = ckpt_h5.load_mlp_actor(p)
        assert all(np.isfinite(l["w"]).all() for l in actor["layers"])
        dyn = load_params_json(p.replace(".h5", "_dynamics.json"))
        assert float(dyn.mass) > 0
    assert not os.path.exists(manifest + ".tmp")
