"""apps/eval_teachers: per-teacher eval report over a pack/manifest.

The quality-gate tool for pre-training throughput changes (round 4:
row-contiguous sampling) — must produce the full return-distribution
report and run identically from a manifest or a pack.
"""

import json
import os

import jax
import numpy as np

from raptor_tpu.apps import eval_teachers
from tests.test_teacher_pack import _make_manifest


def test_eval_teachers_report(tmp_path, monkeypatch):
    tmp = str(tmp_path)
    manifest = _make_manifest(tmp, k=2)
    out = os.path.join(tmp, "report.json")
    # tiny episodes: patch the env episode length via argv episodes only
    # (episode cap comes from the env; 2 eval episodes per teacher keeps
    # the CPU run fast enough at the full 500-step cap)
    eval_teachers.main([manifest, "--episodes", "2", "--out", out])
    with open(out) as f:
        report = json.load(f)
    (key, stats), = report.items()
    assert key == manifest
    assert stats["teachers"] == 2
    assert stats["episodes_per_teacher"] == 2
    assert len(stats["per_teacher_return"]) == 2
    for k in ("return/mean", "return/p10", "return/p50", "return/p90",
              "episode_length/mean", "share_terminated/mean"):
        assert np.isfinite(stats[k])
    # random-init actors cannot fly: episodes terminate early
    assert stats["episode_length/mean"] < 500.0
