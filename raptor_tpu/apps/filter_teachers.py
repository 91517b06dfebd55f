"""Curate a teacher pack by measured per-teacher quality.

Round-5 finding (artifacts/eval_teachers_hover02*.json): every severity
wave leaves ~8-14% of teachers unable to HOVER their own airframe from a
0.2-rad start — severity-heavy SAC training can converge to policies
that recover but never settle.  In DAgger distillation those teachers'
labels are noise everywhere near hover, and the 768-teacher flagship
(`rateFlag`) showed a flat ~9% all-angle airframe tail traced to this
(tools/hover_tail_probe.py).  This tool subsets a pack to the teachers
that pass measured gates, producing a curated pack `load_teachers`
accepts anywhere.

Mirrors the reference's implicit teacher-quality gate: its pre_training
teachers train from gentle inits and all hover (tfevents envelope,
BASELINE.md); ours must be gated explicitly because severity waves
deliberately skew the init distribution (SURVEY §3.5).

    python -m raptor_tpu.apps.filter_teachers \
        artifacts/teachers_demo2500_30M.npz out.npz \
        --eval artifacts/eval_teachers_hover02.json --max-term 0.5
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def filter_pack(pack_path: str, out_path: str, keep: np.ndarray,
                note: str) -> int:
    from raptor_tpu.apps.pack_teachers import (
        load_teacher_pack, save_teacher_pack,
    )

    actors, frames = load_teacher_pack(pack_path)
    k = int(np.asarray(frames.mass).shape[0])
    assert keep.shape == (k,), (keep.shape, k)
    idx = np.flatnonzero(keep)
    sub_actors = {
        "layers": [
            {"w": np.asarray(l["w"])[idx], "b": np.asarray(l["b"])[idx]}
            for l in actors["layers"]
        ]
    }
    import jax

    sub_frames = jax.tree.map(lambda x: np.asarray(x)[idx], frames)
    save_teacher_pack(out_path, sub_actors, sub_frames,
                      meta={"filtered_from": pack_path, "note": note})
    return len(idx)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("pack")
    p.add_argument("out")
    p.add_argument("--eval", required=True,
                   help="eval_teachers JSON containing this pack's "
                        "per_teacher_* arrays")
    p.add_argument("--max-term", type=float, default=None,
                   help="drop teachers with per_teacher_share_terminated "
                        ">= this")
    p.add_argument("--min-return", type=float, default=None,
                   help="drop teachers with per_teacher_return < this")
    args = p.parse_args(argv)

    report = json.load(open(args.eval))
    if args.pack not in report:
        raise SystemExit(
            f"{args.eval} has no entry for {args.pack!r} "
            f"(has: {list(report)})"
        )
    d = report[args.pack]
    k = d["teachers"]
    keep = np.ones(k, bool)
    if args.max_term is not None:
        term = np.array(d["per_teacher_share_terminated"])
        keep &= term < args.max_term
    if args.min_return is not None:
        ret = np.array(d["per_teacher_return"])
        keep &= ret >= args.min_return
    note = f"max_term={args.max_term} min_return={args.min_return} " \
           f"eval={args.eval}"
    kept = filter_pack(args.pack, args.out, keep, note)
    print(f"{args.pack}: kept {kept}/{k} -> {args.out}")


if __name__ == "__main__":
    main()
