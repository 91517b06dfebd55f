"""export_policy CLI: portable golden-I/O embedding + drift gate.

Regressions from the round-2 640-teacher export: a TPU-saved checkpoint's
embedded golden outputs drift ~3e-4 on CPU replay over the 500-step
recurrent unroll, so the exporter re-derives them with the deployment-side
path and hard-fails only on corruption-scale drift."""

import h5py
import jax
import numpy as np
import pytest

from raptor_tpu.apps import export_policy
from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.policy import network as student_net


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "student.h5"
    ckpt_h5.save_actor(str(path), student_net.init_params(jax.random.key(3)))
    return str(path)


def test_export_both_formats(ckpt, tmp_path):
    raptor_h = tmp_path / "policy.h"
    rltools_h = tmp_path / "checkpoint.h"
    export_policy.main([ckpt, str(raptor_h), "--format", "raptor"])
    export_policy.main([ckpt, str(rltools_h), "--format", "rltools"])
    assert b"raptor_checkpoint" in raptor_h.read_bytes()
    assert b"rl_tools::checkpoint" in rltools_h.read_bytes()


def test_export_rejects_corrupt_golden_io(ckpt, tmp_path):
    """Corruption-scale drift between weights and embedded outputs must
    abort the export (a silently wrong header would fly a drone)."""
    bad = tmp_path / "corrupt.h5"
    import shutil

    shutil.copy(ckpt, bad)
    with h5py.File(bad, "r+") as f:
        out = f["example"]["output"]
        out[0, 0, 0] = out[0, 0, 0] + 0.5
    with pytest.raises(SystemExit):
        export_policy.main([str(bad), str(tmp_path / "x.h"),
                            "--format", "raptor"])


def test_compare_baseline_prefers_gradient_steps_tag(tmp_path):
    """Our decimated loss series undercounts by event count; the explicit
    gradient_steps tag must win (reference logs keep using event count)."""
    from raptor_tpu.apps.compare_baseline import summarize
    from raptor_tpu.utils.tfevents import SummaryWriter, read_scalars

    w = SummaryWriter(str(tmp_path / "run"))
    for i in range(10):  # decimated: 10 events covering 913 true steps
        w.scalar("loss", 0.1, i * 100)
    w.scalar("gradient_steps", 913.0, 999)
    w.scalar("evaluation/return/mean", 100.0, 999)
    w.close()
    out = summarize(read_scalars(w.path), "ours")
    assert out["n_gradient_steps"] == 913
    # reference-style log (no counter tag): event count is the counter
    ref = {"loss": [(i, 0.1) for i in range(37)]}
    assert summarize(ref, "ref")["n_gradient_steps"] == 37
