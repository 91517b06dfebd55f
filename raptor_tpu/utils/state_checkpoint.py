"""Training-state checkpoint/resume: save/restore arbitrary pytrees.

The reference checkpoints policies only (HDF5 + code export); long-running
TPU training additionally needs full trainer-state snapshots (replay ring,
optimizer moments, env states, RNG keys) for preemption-safe resume. Format:
one .npz with flattened leaves + a JSON treedef descriptor — no extra
dependencies, works for any of this framework's state pytrees
(runner.TrainerState, distill round state, ...).
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Snapshot a pytree to <path>.npz + <path>.treedef.json (atomic via
    tmp-rename)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {}
    for i, leaf in enumerate(leaves):
        # jax PRNG keys are opaque extended dtypes; store raw key data
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
            leaf.dtype, jax.dtypes.prng_key
        ):
            arrays[f"leaf_{i}__prngkey"] = np.asarray(jax.random.key_data(leaf))
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    with open(path + ".treedef.json", "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves)}, f)


def restore_pytree(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (shapes/dtypes validated)."""
    data = np.load(path + ".npz")
    leaves, treedef = jax.tree.flatten(template)
    out = []
    for i, leaf in enumerate(leaves):
        if f"leaf_{i}__prngkey" in data:
            out.append(jax.random.wrap_key_data(jax.numpy.asarray(data[f"leaf_{i}__prngkey"])))
        else:
            arr = data[f"leaf_{i}"]
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != template {leaf.shape}"
                )
            out.append(jax.numpy.asarray(arr))
    return jax.tree.unflatten(treedef, out)


def latest_checkpoint(directory: str, prefix: str = "state_") -> Tuple[str, int] | None:
    """Find the newest state checkpoint `<prefix><step>` in a directory."""
    if not os.path.isdir(directory):
        return None
    best = None
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                step = int(name[len(prefix):].split(".")[0])
            except ValueError:
                continue
            if best is None or step > best[1]:
                best = (os.path.join(directory, name[: -len(".npz")]), step)
    return best
