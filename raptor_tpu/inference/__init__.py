from raptor_tpu.inference.executor import Executor, ExecutorConfig  # noqa: F401
from raptor_tpu.inference.native import (  # noqa: F401
    Firmware,
    NativeExecutor,
    build_executor,
    build_firmware,
)
