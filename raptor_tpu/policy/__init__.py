from raptor_tpu.policy import network  # noqa: F401
from raptor_tpu.policy.raptor import Raptor, shipped_checkpoint_path  # noqa: F401
