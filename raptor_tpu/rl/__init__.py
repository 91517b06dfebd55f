from raptor_tpu.rl import (  # noqa: F401
    evaluation,
    loop,
    networks,
    ppo,
    replay,
    runner,
    runner_generic,
    runner_gru,
    sac,
    sac_gru,
    td3,
)
