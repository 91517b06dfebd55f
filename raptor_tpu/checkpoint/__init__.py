from raptor_tpu.checkpoint import h5  # noqa: F401
