"""Pack/unpack a teacher population into a single compressed .npz.

Teacher checkpoints live in gitignored experiment run dirs and the build
machine is reimaged between rounds — round 2 lost all 1024 trained teachers
that way (only git-tracked files survive). This tool freezes a manifest's
population (stacked actor pytree + airframes) into one compressed archive
small enough to commit (~27 KB/teacher f32), and `load_teachers`
(raptor_tpu.apps.post_training) accepts the .npz anywhere a
checkpoints.txt manifest is accepted, so distillation / benchmarks can run
from the committed pack alone.

Mirrors the role of the reference's `foundation-policy-v1-data` tarball
(the teacher-checkpoint dataset distributed alongside the repo,
/root/reference/.MISSING_LARGE_BLOBS) — ours is per-population and small
because the actors are tiny MLPs.

    python -m raptor_tpu.apps.pack_teachers pack <checkpoints.txt> <out.npz>
    python -m raptor_tpu.apps.pack_teachers info <pack.npz>
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.env.io import _FIELDS
from raptor_tpu.env.types import DynamicsParams

PACK_VERSION = 1


def save_teacher_pack(path: str, teacher_actors, airframes,
                      meta: dict | None = None) -> None:
    """teacher_actors: stacked [K] MLP pytree {"layers": [{w,b}, ...]};
    airframes: stacked [K] DynamicsParams."""
    arrays = {}
    for i, layer in enumerate(teacher_actors["layers"]):
        arrays[f"actor/layers/{i}/w"] = np.asarray(layer["w"], np.float32)
        arrays[f"actor/layers/{i}/b"] = np.asarray(layer["b"], np.float32)
    for f in _FIELDS:
        arrays[f"airframe/{f}"] = np.asarray(getattr(airframes, f),
                                             np.float32)
    k = arrays["airframe/mass"].shape[0]
    arrays["meta"] = np.frombuffer(
        json.dumps(
            {"version": PACK_VERSION, "n_teachers": int(k), **(meta or {})}
        ).encode(),
        dtype=np.uint8,
    )
    with open(path, "wb") as fh:
        np.savez_compressed(fh, **arrays)


def load_teacher_pack(path: str):
    """Returns (teacher_actors, airframes) exactly as
    post_training.load_teachers would from the original manifest.

    Self-verifies on load (the h5 checkpoint convention, ADVICE r2): the
    embedded meta must parse, carry a known version, and agree with the
    loaded K — a truncated/corrupt or future-format pack errors clearly
    instead of loading silently."""
    with np.load(path) as z:
        try:
            meta = json.loads(bytes(z["meta"]).decode())
        except (KeyError, ValueError) as e:
            raise ValueError(
                f"teacher pack {path!r} has no parseable meta — truncated "
                f"or not a raptor_tpu teacher pack ({e})"
            ) from e
        if meta.get("version") != PACK_VERSION:
            raise ValueError(
                f"teacher pack {path!r} is format version "
                f"{meta.get('version')!r}; this build reads version "
                f"{PACK_VERSION}"
            )
        n_layers = sum(1 for k in z.files if k.endswith("/w"))
        layers = [
            {
                "w": jnp.asarray(z[f"actor/layers/{i}/w"]),
                "b": jnp.asarray(z[f"actor/layers/{i}/b"]),
            }
            for i in range(n_layers)
        ]
        airframes = DynamicsParams(
            **{f: jnp.asarray(z[f"airframe/{f}"]) for f in _FIELDS}
        )
        k = int(jax.tree.leaves(airframes)[0].shape[0])
        if meta.get("n_teachers") != k:
            raise ValueError(
                f"teacher pack {path!r}: meta says {meta.get('n_teachers')} "
                f"teachers but arrays hold {k}"
            )
    return {"layers": layers}, airframes


def pack_info(path: str) -> dict:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        meta["actor_param_count_per_teacher"] = int(
            sum(
                int(np.prod(z[k].shape[1:]))
                for k in z.files
                if k.startswith("actor/")
            )
        )
    return meta


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("pack")
    pp.add_argument("manifest", help="checkpoints.txt")
    pp.add_argument("out", help="output .npz path")
    ip = sub.add_parser("info")
    ip.add_argument("pack", help=".npz path")
    args = p.parse_args(argv)

    if args.cmd == "pack":
        from raptor_tpu.apps.post_training import load_teachers

        teacher_actors, airframes = load_teachers(args.manifest)
        save_teacher_pack(args.out, teacher_actors, airframes,
                          meta={"source_manifest": args.manifest})
        print(json.dumps(pack_info(args.out)))
    else:
        print(json.dumps(pack_info(args.pack)))


if __name__ == "__main__":
    main()
