"""raptor_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of rl-tools/raptor: a foundation-policy training stack for
quadrotor low-level control.

The reference (https://github.com/rl-tools/raptor, surveyed in /root/repo/SURVEY.md)
is a header-only C++ stack (rl-tools + the l2f simulator). This package is a
from-scratch TPU-first redesign:

- the l2f quadrotor simulator becomes a pure-JAX vectorized engine
  (`raptor_tpu.env`) stepping tens of thousands of domain-randomized airframes
  in lockstep under one `jit`;
- the NN stack (`raptor_tpu.policy`, `raptor_tpu.rl.networks`) is a small
  functional pytree-module system (no template metaprogramming — JAX's tracing
  gives static shapes natively);
- SAC pre-training and DAgger-style distillation (`raptor_tpu.rl`,
  `raptor_tpu.distill`) run as jitted super-steps; the reference's
  1000-process teacher farm becomes a vmapped *population axis*;
- multi-chip scaling uses `jax.sharding.Mesh` + collectives over ICI
  (`raptor_tpu.parallel`) instead of a filesystem process farm.

Layer map parity: see SURVEY.md §2/§3; per-module docstrings cite the
reference anchors (README:N / ckpt.h:N) they mirror.
"""

__version__ = "0.1.0"

# Honor RAPTOR_PLATFORM before ANY submodule import: flax.struct pytree
# registration at import time can initialize the JAX backend, after which
# utils.cache.enable_persistent_cache()'s platform override is silently
# too late (observed: a CPU-intended probe running on the live TPU).
import os as _os

if _os.environ.get("RAPTOR_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["RAPTOR_PLATFORM"])
    except Exception:
        pass

from raptor_tpu.policy.raptor import Raptor  # noqa: F401  (README:16-25 API mirror)
