"""tfevents writer/reader roundtrip + cross-check against TF's reader, and
parsing of the shipped reference log (format compatibility both ways)."""

import glob
import os

import numpy as np
import pytest

from raptor_tpu.utils import extrack, tfevents


def test_roundtrip(tmp_path):
    w = tfevents.SummaryWriter(str(tmp_path))
    for i in range(10):
        w.scalar("loss", 1.0 / (i + 1), step=i * 5)
    w.scalar("evaluation/return/mean", 618.98, step=100)
    w.close()
    out = tfevents.read_scalars(w.path)
    assert len(out["loss"]) == 10
    assert out["loss"][3] == (15, pytest.approx(0.25))
    assert out["evaluation/return/mean"][0][1] == pytest.approx(618.98)


def test_tensorflow_can_read_our_files(tmp_path):
    tf = pytest.importorskip("tensorflow")
    w = tfevents.SummaryWriter(str(tmp_path))
    w.scalar("a/b", 3.14, step=7)
    w.close()
    rows = []
    for rec in tf.data.TFRecordDataset(w.path):
        ev = tf.compat.v1.Event.FromString(rec.numpy())
        for v in ev.summary.value:
            rows.append((v.tag, ev.step, v.simple_value))
    assert ("a/b", 7, pytest.approx(3.14)) in [
        (t, s, pytest.approx(val)) for t, s, val in rows
    ]


def test_read_reference_log():
    """Our reader parses the shipped reference post-training log and recovers
    the survey's headline numbers (SURVEY §6.2)."""
    from raptor_tpu.policy import shipped_checkpoint_path

    ckpt = shipped_checkpoint_path()
    log = glob.glob(os.path.join(os.path.dirname(ckpt), "logs.tfevents"))
    assert log
    out = tfevents.read_scalars(log[0])
    assert len(out["loss"]) == 146103
    ret = out["evaluation/return/mean"]
    assert len(ret) == 1000
    assert ret[-1][0] == 75323201
    assert abs(ret[-1][1] - 618.98) < 0.05
    assert "crazyflie/return/mean" in out


def test_extrack_run(tmp_path):
    run = extrack.Run(base_dir=str(tmp_path), experiment="exp-a", name="seed0")
    run.snapshot_config({"lr": 3e-4, "arr": np.arange(3)})
    run.log({"loss": 0.5, "evaluation/return/mean": 100.0}, step=10)
    run.close()
    assert os.path.exists(os.path.join(run.dir, "config.json"))
    out = tfevents.read_scalars(run.writer.path)
    assert out["loss"][0] == (10, 0.5)
    assert run.checkpoint_path(7).endswith("000000000007.h5")


def test_compare_baseline_matched_curves(tmp_path):
    """VERDICT r1 #3: apples-to-apples curves — the reference series is
    interpolated at OUR env-step positions so each row compares equals."""
    from raptor_tpu.apps import compare_baseline as cb

    ours = {"evaluation/return/mean": [(100, 10.0), (200, 20.0), (300, 30.0)]}
    ref = {"evaluation/return/mean": [(0, 0.0), (400, 40.0)]}
    out = cb.matched_curves(ours, ref)
    rows = out["evaluation/return/mean"]
    assert [r["env_steps"] for r in rows] == [100, 200, 300]
    # linear reference: interp at matched steps equals ours exactly
    assert all(r["ours"] == r["reference"] for r in rows)

    report = {
        "ours": {"label": "run-a", "final_return": 30.0},
        "reference": {"label": "ref", "final_return": 40.0},
        "matched_curves": out,
    }
    path = str(tmp_path / "report.md")
    cb.write_report(path, report)
    text = open(path).read()
    assert "| 300 | 30.0 | 30.0 |" in text
    assert "final_return" in text
