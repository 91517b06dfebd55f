from raptor_tpu.utils import extrack, tfevents  # noqa: F401
