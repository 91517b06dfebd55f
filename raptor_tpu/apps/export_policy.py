"""CLI: export a policy checkpoint (.h5) as a compiled-in C/C++ header —
the reference's firmware deployment path (README:226-231, SURVEY §3.6).

Two formats:
  --format raptor   (default) dependency-free C99 header with embedded
                    golden-I/O self-test (checkpoint/code_export.py)
  --format rltools  upstream `rl_tools::checkpoint` namespace header,
                    compilable into unmodified rl-tools firmware
                    (checkpoint/rltools_export.py; ckpt.h:34-220 format)

    python -m raptor_tpu.apps.export_policy student.h5 policy.h --format rltools
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from raptor_tpu.checkpoint import code_export, h5, rltools_export

    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help=".h5 policy checkpoint")
    p.add_argument("out", help="output header path")
    p.add_argument("--format", choices=("raptor", "rltools"),
                   default="raptor")
    p.add_argument("--name", default=None,
                   help="meta name embedded in the header")
    args = p.parse_args(argv)

    import sys

    import jax.numpy as jnp
    import numpy as np

    from raptor_tpu.policy import network

    params = h5.load_actor(args.checkpoint)
    ei, eo = h5.load_example_io(args.checkpoint)
    name = args.name or args.checkpoint
    # Recompute the golden outputs with the deployment-side (CPU f32,
    # highest matmul precision) path before embedding: a checkpoint saved
    # on TPU carries TPU-flavored outputs that drift ~3e-4 when replayed
    # over 500 recurrent steps on CPU/firmware f32 (measured on the
    # 640-teacher student), which would trip the embedded boot self-test
    # (native/executor.cpp, tolerance 1e-4). The checkpoint-vs-local drift
    # stays an informational cross-platform check.
    import contextlib

    import jax

    def replay_ctx():
        try:
            return jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            return contextlib.nullcontext()

    with replay_ctx(), jax.default_matmul_precision("highest"):
        _, eo_local = network.apply_sequence(params, jnp.asarray(ei))
    eo_local = np.asarray(eo_local, np.float32)
    drift = float(np.max(np.abs(eo_local - np.asarray(eo, np.float32))))
    if drift > 1e-3:
        print(f"WARNING: checkpoint golden-I/O drift {drift:.2e} vs local "
              "replay — checkpoint may be corrupt", file=sys.stderr)
        raise SystemExit(2)
    if args.format == "rltools":
        rltools_export.export_rltools_header(args.out, params, ei, eo_local,
                                             name=name)
        # self-verify: re-import must be bit-exact and reproduce golden I/O
        got, gi, go = rltools_export.import_rltools_header(args.out)
        jp = {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in got.items()}
        with replay_ctx(), jax.default_matmul_precision("highest"):
            _, out = network.apply_sequence(jp, jnp.asarray(gi))
        err = float(jnp.max(jnp.abs(out - jnp.asarray(go))))
        assert np.array_equal(gi, np.asarray(ei, np.float32))
        print(f"{args.out}  format=rltools  self-test max-err: {err:.2e}  "
              f"cross-platform drift: {drift:.2e}")
        assert err < 1e-5
    else:
        code_export.export_header_file(args.out, params, ei, eo_local)
        print(f"{args.out}  format=raptor  cross-platform drift: {drift:.2e}")


if __name__ == "__main__":
    main()
