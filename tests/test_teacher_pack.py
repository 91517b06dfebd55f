"""Teacher-pack round trip: a checkpoints.txt population packed to one .npz
loads back identically through load_teachers (the pack is the committed,
reimage-surviving form of the teacher dataset — the reference distributes
its teachers as the foundation-policy-v1-data tarball)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.apps.pack_teachers import (
    load_teacher_pack,
    pack_info,
    save_teacher_pack,
)
from raptor_tpu.apps.post_training import load_teachers
from raptor_tpu.checkpoint import h5 as ckpt_h5
from raptor_tpu.distill.population import sample_teacher_airframes
from raptor_tpu.env import EnvConfig, L2F
from raptor_tpu.env.io import save_params_json
from raptor_tpu.rl import networks


def _make_manifest(tmp_path, k=3):
    env = L2F(EnvConfig())
    airframes = sample_teacher_airframes(jax.random.key(0), k)
    paths = []
    for i in range(k):
        actor = networks.actor_init(jax.random.key(10 + i),
                                    env.OBSERVATION_DIM, 4)
        p = os.path.join(tmp_path, f"teacher_{i}.h5")
        ckpt_h5.save_mlp_actor(p, actor, meta={"teacher_index": i})
        save_params_json(
            p.replace(".h5", "_dynamics.json"),
            jax.tree.map(lambda x: x[i], airframes),
        )
        paths.append(p)
    manifest = os.path.join(tmp_path, "checkpoints.txt")
    with open(manifest, "w") as f:
        f.write("\n".join(paths) + "\n")
    return manifest


def test_pack_roundtrip(tmp_path):
    tmp = str(tmp_path)
    manifest = _make_manifest(tmp, k=3)
    actors_ref, frames_ref = load_teachers(manifest)

    pack = os.path.join(tmp, "teachers.npz")
    save_teacher_pack(pack, actors_ref, frames_ref, meta={"seed": 0})

    # load_teachers dispatches on the .npz extension
    actors, frames = load_teachers(pack)
    for a, b in zip(jax.tree.leaves(actors_ref), jax.tree.leaves(actors)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(frames_ref), jax.tree.leaves(frames)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert type(frames) is type(frames_ref)

    info = pack_info(pack)
    assert info["n_teachers"] == 3
    assert info["seed"] == 0
    assert info["actor_param_count_per_teacher"] > 0

    # direct pack loader agrees too
    actors2, frames2 = load_teacher_pack(pack)
    np.testing.assert_array_equal(
        np.asarray(actors2["layers"][0]["w"]),
        np.asarray(actors_ref["layers"][0]["w"]),
    )
    assert jnp.all(frames2.mass == frames_ref.mass)


def test_multi_pack_manifest(tmp_path):
    """A manifest whose lines are .npz packs (several pre-training waves)
    concatenates the populations along K — the reimage-surviving path to a
    reference-scale distillation from committed packs alone."""
    tmp = str(tmp_path)
    manifest = _make_manifest(tmp, k=3)
    actors_ref, frames_ref = load_teachers(manifest)

    pack_a = os.path.join(tmp, "wave_a.npz")
    pack_b = os.path.join(tmp, "wave_b.npz")
    sl = lambda tree, lo, hi: jax.tree.map(lambda x: x[lo:hi], tree)
    save_teacher_pack(pack_a, sl(actors_ref, 0, 2), sl(frames_ref, 0, 2))
    save_teacher_pack(pack_b, sl(actors_ref, 2, 3), sl(frames_ref, 2, 3))

    union = os.path.join(tmp, "union.txt")
    with open(union, "w") as f:
        f.write(pack_a + "\n" + pack_b + "\n")
    actors, frames = load_teachers(union)
    for a, b in zip(jax.tree.leaves(actors_ref), jax.tree.leaves(actors)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jnp.all(frames.mass == frames_ref.mass)
    assert type(frames) is type(frames_ref)

    # mixed manifest: the K axis preserves MANIFEST LINE ORDER even when
    # packs and h5 runs interleave (ADVICE r2) — pack first, h5 lines after
    with open(manifest) as f:
        h5_lines = f.read().strip().splitlines()
    mixed = os.path.join(tmp, "mixed.txt")
    with open(mixed, "w") as f:
        f.write(pack_b + "\n" + "\n".join(h5_lines) + "\n")
    actors_m, frames_m = load_teachers(mixed)
    assert frames_m.mass.shape[0] == 4
    np.testing.assert_array_equal(
        np.asarray(frames_m.mass[:1]), np.asarray(frames_ref.mass[2:3])
    )
    np.testing.assert_array_equal(
        np.asarray(frames_m.mass[1:]), np.asarray(frames_ref.mass)
    )


def test_empty_manifest_errors(tmp_path):
    """A blank manifest raises a clear ValueError, not an opaque tree-map
    TypeError (ADVICE r2)."""
    import pytest

    empty = os.path.join(str(tmp_path), "empty.txt")
    with open(empty, "w") as f:
        f.write("\n\n")
    with pytest.raises(ValueError, match="empty"):
        load_teachers(empty)


def test_pack_self_verifies_on_load(tmp_path):
    """Version/meta/K checks on pack load (ADVICE r2): future-format and
    meta-inconsistent packs error clearly."""
    import pytest

    tmp = str(tmp_path)
    manifest = _make_manifest(tmp, k=2)
    actors, frames = load_teachers(manifest)
    pack = os.path.join(tmp, "ok.npz")
    save_teacher_pack(pack, actors, frames)
    load_teacher_pack(pack)  # fine

    # future version
    with np.load(pack) as z:
        arrays = {k: z[k] for k in z.files}
    import json as _json

    arrays["meta"] = np.frombuffer(
        _json.dumps({"version": 99, "n_teachers": 2}).encode(), dtype=np.uint8
    )
    bad_ver = os.path.join(tmp, "bad_ver.npz")
    with open(bad_ver, "wb") as fh:
        np.savez_compressed(fh, **arrays)
    with pytest.raises(ValueError, match="version"):
        load_teacher_pack(bad_ver)

    # K mismatch
    arrays["meta"] = np.frombuffer(
        _json.dumps({"version": 1, "n_teachers": 7}).encode(), dtype=np.uint8
    )
    bad_k = os.path.join(tmp, "bad_k.npz")
    with open(bad_k, "wb") as fh:
        np.savez_compressed(fh, **arrays)
    with pytest.raises(ValueError, match="teachers"):
        load_teacher_pack(bad_k)

    # missing meta entirely
    del arrays["meta"]
    no_meta = os.path.join(tmp, "no_meta.npz")
    with open(no_meta, "wb") as fh:
        np.savez_compressed(fh, **arrays)
    with pytest.raises(ValueError, match="meta"):
        load_teacher_pack(no_meta)


def test_filter_teachers_curates_by_measured_quality(tmp_path):
    """apps/filter_teachers subsets a pack by per-teacher eval gates and
    the curated pack round-trips through load_teachers (round-5 hover-gate
    curation: teachers that cannot hover their own airframe are dropped
    from distillation unions)."""
    import json

    from raptor_tpu.apps import filter_teachers

    tmp = str(tmp_path)
    manifest = _make_manifest(tmp, k=3)
    actors, frames = load_teachers(manifest)
    pack = os.path.join(tmp, "wave.npz")
    save_teacher_pack(pack, actors, frames)

    report = {pack: {
        "teachers": 3,
        "per_teacher_share_terminated": [0.0, 0.75, 0.25],
        "per_teacher_return": [600.0, 100.0, 400.0],
    }}
    ev = os.path.join(tmp, "eval.json")
    with open(ev, "w") as f:
        json.dump(report, f)

    out = os.path.join(tmp, "curated.npz")
    filter_teachers.main([pack, out, "--eval", ev, "--max-term", "0.5"])
    actors_c, frames_c = load_teachers(out)
    assert frames_c.mass.shape[0] == 2  # teacher 1 dropped
    np.testing.assert_array_equal(
        np.asarray(frames_c.mass),
        np.asarray(frames.mass)[[0, 2]],
    )
    np.testing.assert_array_equal(
        np.asarray(actors_c["layers"][0]["w"]),
        np.asarray(actors["layers"][0]["w"])[[0, 2]],
    )

    # combined gates: min-return additionally drops teacher 2
    out2 = os.path.join(tmp, "curated2.npz")
    filter_teachers.main([pack, out2, "--eval", ev,
                          "--max-term", "0.5", "--min-return", "500"])
    _, frames_c2 = load_teachers(out2)
    assert frames_c2.mass.shape[0] == 1
    np.testing.assert_array_equal(
        np.asarray(frames_c2.mass), np.asarray(frames.mass)[[0]]
    )
