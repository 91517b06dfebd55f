from raptor_tpu.ops import pallas_rollout  # noqa: F401
