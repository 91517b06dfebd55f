"""CLI: compare a training run's tfevents against the shipped reference
post-training log (SURVEY §6.2 anchors).

    python -m raptor_tpu.apps.compare_baseline experiments/<run>/events.out.tfevents.*

Prints aligned eval-return curves and the reference headline numbers so
learning-curve parity (BASELINE.json north-star) can be tracked run over
run.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import tarfile

from raptor_tpu.utils import tfevents

_REFERENCE_TGZ = "/root/reference/data/raptor-policy-checkpoint.tar.gz"


def reference_log_path() -> str:
    from raptor_tpu.policy.raptor import _CACHE_DIR, shipped_checkpoint_path

    ckpt = shipped_checkpoint_path()
    path = os.path.join(os.path.dirname(ckpt), "logs.tfevents")
    if not os.path.exists(path):
        with tarfile.open(_REFERENCE_TGZ) as tar:
            tar.extractall(_CACHE_DIR)
    return path


def summarize(scalars: dict, label: str) -> dict:
    out = {"label": label}
    ret = scalars.get("evaluation/return/mean", [])
    if ret:
        out["final_return"] = ret[-1][1]
        out["final_step"] = ret[-1][0]
        out["n_evals"] = len(ret)
        out["curve"] = [
            (s, round(v, 1)) for s, v in ret[:: max(len(ret) // 8, 1)]
        ]
    if "evaluation/episode_length/mean" in scalars:
        out["final_episode_length"] = scalars["evaluation/episode_length/mean"][-1][1]
    if "evaluation/share_terminated" in scalars:
        out["final_share_terminated"] = scalars["evaluation/share_terminated"][-1][1]
    if "loss" in scalars:
        out["n_gradient_steps"] = len(scalars["loss"])
        out["final_loss"] = scalars["loss"][-1][1]
    if "crazyflie/return/mean" in scalars:
        out["crazyflie_final_return"] = scalars["crazyflie/return/mean"][-1][1]
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_events", nargs="?",
                   help="tfevents file (or glob) of the run to compare; "
                        "default: newest under experiments/")
    args = p.parse_args(argv)

    if args.run_events:
        candidates = sorted(glob.glob(args.run_events))
    else:
        candidates = sorted(
            glob.glob("experiments/**/events.out.tfevents.*", recursive=True),
            key=os.path.getmtime,
        )
    if not candidates:
        p.error("no run tfevents found")
    run_path = candidates[-1]

    ours = summarize(tfevents.read_scalars(run_path), run_path)
    ref = summarize(
        tfevents.read_scalars(reference_log_path()),
        "reference post-training (2025-04-19_16-16-17)",
    )
    report = {"ours": ours, "reference": ref}
    if "final_return" in ours and "final_return" in ref:
        report["return_ratio_vs_reference"] = round(
            ours["final_return"] / ref["final_return"], 3
        )
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
