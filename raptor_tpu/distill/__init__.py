from raptor_tpu.distill import population, post_training  # noqa: F401
