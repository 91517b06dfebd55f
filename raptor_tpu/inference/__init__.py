from raptor_tpu.inference.executor import Executor, ExecutorConfig  # noqa: F401
from raptor_tpu.inference.native import (  # noqa: F401
    Firmware,
    NativeExecutor,
    PlatformFirmware,
    build_executor,
    build_firmware,
)
