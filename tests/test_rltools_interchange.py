"""rl-tools `checkpoint.h` interchange tests (VERDICT r1 missing item 6).

Both directions: (a) import the SHIPPED reference checkpoint.h and verify
golden-I/O parity against the h5 loader + our network, (b) export one of our
checkpoints to the rl-tools format and re-import it bit-exactly.
"""

import glob
import os

import jax.numpy as jnp
import numpy as np

from raptor_tpu.checkpoint import h5, rltools_export
from raptor_tpu.policy import network, shipped_checkpoint_path


def _shipped_header() -> str:
    ckpt = shipped_checkpoint_path()  # extracts the tarball to .cache
    hits = glob.glob(os.path.join(os.path.dirname(ckpt), "checkpoint.h"))
    assert hits, "shipped checkpoint.h not found next to checkpoint.h5"
    return hits[0]


def test_import_shipped_reference_header():
    """Our importer reads the actual upstream-generated artifact, and the
    weights drive our GRU network to the same outputs as the h5 weights."""
    params, ei, eo = rltools_export.import_rltools_header(_shipped_header())
    assert params["dense_0"]["weights"].shape == (16, 22)
    assert params["gru_1"]["weights_input"].shape == (48, 16)
    assert params["dense_2"]["weights"].shape == (4, 16)
    assert ei.shape == (500, 2, 22) and eo.shape == (500, 2, 4)

    # cross-check vs the h5 copy of the same checkpoint
    p_h5 = h5.load_actor(shipped_checkpoint_path())
    for layer in ("dense_0", "gru_1", "dense_2"):
        for k in params[layer]:
            np.testing.assert_array_equal(
                np.asarray(params[layer][k]),
                np.asarray(p_h5[layer][k]).reshape(params[layer][k].shape),
                err_msg=f"{layer}/{k}",
            )

    # golden I/O through our network (same contract as the h5 self-test)
    jp = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
          for k, v in params.items()}
    _, out = network.apply_sequence(jp, jnp.asarray(ei))
    err = float(jnp.max(jnp.abs(out - jnp.asarray(eo))))
    assert err < 1e-4, f"golden-I/O mismatch: {err}"


def test_export_roundtrip(tmp_path):
    """Export our own (h5-loaded) params to rl-tools format; re-import must
    be bit-exact, and the structural skeleton must match the reference's."""
    src = shipped_checkpoint_path()
    params = h5.load_actor(src)
    ei, eo = h5.load_example_io(src)
    path = str(tmp_path / "checkpoint.h")
    rltools_export.export_rltools_header(
        path, params, ei, eo, name="roundtrip-test", commit_hash="abc123"
    )
    got, gi, go = rltools_export.import_rltools_header(path)
    for layer in ("dense_0", "gru_1", "dense_2"):
        for k in got[layer]:
            np.testing.assert_array_equal(
                np.asarray(got[layer][k]),
                np.asarray(params[layer][k]).reshape(got[layer][k].shape),
                err_msg=f"{layer}/{k}",
            )
    np.testing.assert_array_equal(gi, np.asarray(ei, np.float32))
    np.testing.assert_array_equal(go, np.asarray(eo, np.float32))

    text = open(path).read()
    ref = open(_shipped_header()).read()
    # every structural type alias the upstream firmware consumes must be
    # present with identical template arguments
    for marker in (
        "rl_tools::checkpoint::actor",
        "nn::layers::dense::Configuration<float, unsigned long, 16",
        "nn::layers::gru::Configuration<float, unsigned long, 16",
        "nn::layers::dense::Configuration<float, unsigned long, 4",
        "nn_models::sequential::Build<CAPABILITY, MODULE_CHAIN, "
        "layer_0::INPUT_SHAPE>",
        "rl_tools::checkpoint::example::input",
        "rl_tools::checkpoint::example::output",
        "rl_tools::checkpoint::meta",
    ):
        assert marker in text, marker
        assert marker in ref, marker  # and really is the upstream shape
