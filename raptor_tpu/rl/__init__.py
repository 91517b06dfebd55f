from raptor_tpu.rl import evaluation, networks, replay, runner, sac  # noqa: F401
