from raptor_tpu.inference.executor import Executor, ExecutorConfig  # noqa: F401
from raptor_tpu.inference.native import NativeExecutor, build_executor  # noqa: F401
