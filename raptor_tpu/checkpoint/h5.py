"""HDF5 checkpoint interchange in the reference rl-tools schema.

Schema (SURVEY.md §A.1, read from the shipped ckpt.h5):

    actor/                         attrs: type, checkpoint_name, meta
      layers/0/{weights,biases}/parameters          dense (out x in), (1, out)
      layers/1/{weights_input,weights_hidden}/parameters     (3H, H)
      layers/1/{biases_input,biases_hidden}/parameters       (3H,)
      layers/1/initial_hidden_state/parameters               (H,)
      layers/2/{weights,biases}/parameters
    example/input   (T, B, obs)    golden I/O test vectors — every exported
    example/output  (T, B, act)    checkpoint self-verifies on load

This module reads/writes that schema so checkpoints interchange with the
reference tooling (loaders in rl-tools persist/, reference README:211-216).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import numpy as np

from raptor_tpu.policy import network


def load_actor(path: str) -> Dict[str, Any]:
    """Load an actor parameter pytree from a reference-schema h5 file."""
    import h5py

    with h5py.File(path, "r") as f:
        layers = f["actor"]["layers"]

        def arr(ds):
            return np.asarray(ds, dtype=np.float32)

        params = {
            "dense_0": {
                "weights": arr(layers["0"]["weights"]["parameters"]),
                "biases": arr(layers["0"]["biases"]["parameters"]).reshape(-1),
            },
            "gru_1": {
                "weights_input": arr(layers["1"]["weights_input"]["parameters"]),
                "weights_hidden": arr(layers["1"]["weights_hidden"]["parameters"]),
                "biases_input": arr(layers["1"]["biases_input"]["parameters"]),
                "biases_hidden": arr(layers["1"]["biases_hidden"]["parameters"]),
                "initial_hidden_state": arr(
                    layers["1"]["initial_hidden_state"]["parameters"]
                ),
            },
            "dense_2": {
                "weights": arr(layers["2"]["weights"]["parameters"]),
                "biases": arr(layers["2"]["biases"]["parameters"]).reshape(-1),
            },
        }
    return params


def load_example_io(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Golden example I/O vectors ([T,B,obs], [T,B,act])."""
    import h5py

    with h5py.File(path, "r") as f:
        return (
            np.asarray(f["example"]["input"], dtype=np.float32),
            np.asarray(f["example"]["output"], dtype=np.float32),
        )


def save_actor(
    path: str,
    params: Dict[str, Any],
    example_input: Optional[np.ndarray] = None,
    example_output: Optional[np.ndarray] = None,
    checkpoint_name: str = "",
    meta: Optional[dict] = None,
) -> None:
    """Write an actor pytree (+ golden I/O) in the reference schema.

    If example vectors are not given, fresh N(0,1) test vectors are generated
    and run through the policy — mirroring the reference's export-time capture
    (its example/input is synthetic noise too, SURVEY §0.3.4).
    """
    import h5py

    p = {k: {kk: np.asarray(vv, np.float32) for kk, vv in v.items()} for k, v in params.items()}
    if example_input is None:
        rng = np.random.default_rng(0)
        obs_dim = p["dense_0"]["weights"].shape[1]
        # [500, 2, obs] — the reference's exact example shape (ckpt.h5::
        # example/input is [SEQUENCE_LENGTH=500, BATCH=2, 22] synthetic noise)
        example_input = rng.standard_normal((500, 2, obs_dim)).astype(np.float32)
    if example_output is None:
        import jax

        with jax.default_matmul_precision("highest"):
            _, out = network.apply_sequence(params, example_input)
        example_output = np.asarray(out, np.float32)

    if meta is None:
        meta = {
            "environment": {
                "name": "l2f",
                "observation": "Position.OrientationRotationMatrix.LinearVelocity."
                "AngularVelocityDelayed(0).ActionHistory(1)",
            }
        }

    with h5py.File(path, "w") as f:
        actor = f.create_group("actor")
        actor.attrs["type"] = "sequential"
        actor.attrs["checkpoint_name"] = checkpoint_name
        actor.attrs["meta"] = json.dumps(meta)
        layers = actor.create_group("layers")

        def put(group, name, value, as_row=False):
            v = np.asarray(value, np.float32)
            if as_row and v.ndim == 1:
                v = v.reshape(1, -1)
            group.create_group(name).create_dataset("parameters", data=v)

        l0 = layers.create_group("0")
        put(l0, "weights", p["dense_0"]["weights"])
        put(l0, "biases", p["dense_0"]["biases"], as_row=True)
        l1 = layers.create_group("1")
        put(l1, "weights_input", p["gru_1"]["weights_input"])
        put(l1, "weights_hidden", p["gru_1"]["weights_hidden"])
        put(l1, "biases_input", p["gru_1"]["biases_input"])
        put(l1, "biases_hidden", p["gru_1"]["biases_hidden"])
        put(l1, "initial_hidden_state", p["gru_1"]["initial_hidden_state"])
        l2 = layers.create_group("2")
        put(l2, "weights", p["dense_2"]["weights"])
        put(l2, "biases", p["dense_2"]["biases"], as_row=True)

        ex = f.create_group("example")
        ex.create_dataset("input", data=np.asarray(example_input, np.float32))
        ex.create_dataset("output", data=np.asarray(example_output, np.float32))


def save_mlp_actor(path: str, actor_params: Dict[str, Any], meta: Optional[dict] = None):
    """Save a feedforward (teacher) actor: groups actor/layers/{i}/{weights,
    biases}/parameters with an `mlp` type attr — same schema family as the
    sequential GRU checkpoint (§A.1) so tooling can introspect either."""
    import h5py

    with h5py.File(path, "w") as f:
        actor = f.create_group("actor")
        actor.attrs["type"] = "mlp"
        if meta is not None:
            actor.attrs["meta"] = json.dumps(meta)
        layers = actor.create_group("layers")
        for i, layer in enumerate(actor_params["layers"]):
            g = layers.create_group(str(i))
            g.create_group("weights").create_dataset(
                "parameters", data=np.asarray(layer["w"], np.float32)
            )
            g.create_group("biases").create_dataset(
                "parameters", data=np.asarray(layer["b"], np.float32)
            )


def load_mlp_actor(path: str) -> Dict[str, Any]:
    import h5py

    with h5py.File(path, "r") as f:
        layers_g = f["actor"]["layers"]
        layers = []
        for i in sorted(layers_g.keys(), key=int):
            layers.append(
                {
                    "w": np.asarray(layers_g[i]["weights"]["parameters"], np.float32),
                    "b": np.asarray(layers_g[i]["biases"]["parameters"], np.float32),
                }
            )
    return {"layers": layers}


def verify_checkpoint(path: str, atol: float = 1e-3) -> float:
    """Self-verify a checkpoint against its embedded golden I/O.

    Returns the max abs error; raises AssertionError above `atol`. This is
    the loader-side mirror of the reference's compiled-in self-test
    (reference README:136-137,155). Default tolerance admits cross-platform
    f32 drift: TPU-written golden I/O (highest matmul precision) replayed on
    CPU measures 2.75e-4 over the 500-step recurrent unroll (the 640-teacher
    student artifact); wrong gate-order/semantics variants fail by >=0.8, so
    1e-3 keeps full discrimination. Same-platform replay stays <=1e-6 —
    pass an explicit atol to pin that."""
    import jax

    params = load_actor(path)
    ex_in, ex_out = load_example_io(path)
    with jax.default_matmul_precision("highest"):
        _, ours = network.apply_sequence(params, ex_in)
    err = float(np.max(np.abs(np.asarray(ours) - ex_out)))
    assert err <= atol, f"checkpoint self-test failed: max abs err {err} > {atol}"
    return err
