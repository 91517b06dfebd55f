from raptor_tpu.env.types import (  # noqa: F401
    POLICY_OBS_DIM,
    DynamicsParams,
    EnvConfig,
    InitConfig,
    ObservationConfig,
    RewardConfig,
    State,
    TerminationConfig,
    observation_dim,
)
from raptor_tpu.env.quad import EnvState, L2F  # noqa: F401
from raptor_tpu.env.randomization import (  # noqa: F401
    RandomizationConfig,
    sample_dynamics_params,
    sample_population,
)
from raptor_tpu.env import dynamics, maths, presets  # noqa: F401
