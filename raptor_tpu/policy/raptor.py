"""`Raptor` — the pip-package-compatible inference API.

Mirrors the reference `foundation_policy` package surface (README:16-25,48,
94-97): `Raptor()`, `.reset()`, `.evaluate_step(obs[B,22]) -> action[B,4]`,
stateful hidden per batch row. The compute path is the jitted functional
network in `raptor_tpu.policy.network`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.policy import network

_SHIPPED_CKPT_TGZ = "/root/reference/data/raptor-policy-checkpoint.tar.gz"
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache")


def shipped_checkpoint_path() -> str:
    """Extract (once) and return the path of the shipped reference checkpoint.h5."""
    import glob
    import tarfile

    hits = glob.glob(os.path.join(_CACHE_DIR, "*", "checkpoint.h5"))
    if hits:
        return hits[0]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    with tarfile.open(_SHIPPED_CKPT_TGZ) as tar:
        tar.extractall(_CACHE_DIR)
    hits = glob.glob(os.path.join(_CACHE_DIR, "*", "checkpoint.h5"))
    if not hits:
        raise FileNotFoundError("checkpoint.h5 not found in shipped tarball")
    return hits[0]


class Raptor:
    """Stateful batched inference wrapper around the foundation policy.

    >>> policy = Raptor()
    >>> policy.reset()                     # h := learned initial hidden state
    >>> action = policy.evaluate_step(obs) # obs [B, 22] -> action [B, 4]
    """

    def __init__(self, checkpoint_path: Optional[str] = None, batch_size: int = 1):
        from raptor_tpu.checkpoint import h5 as ckpt_h5

        if checkpoint_path is None:
            checkpoint_path = shipped_checkpoint_path()
        self.params = jax.tree.map(jnp.asarray, ckpt_h5.load_actor(checkpoint_path))
        self.batch_size = batch_size
        self._step = jax.jit(network.apply_step)
        self.reset()

    def reset(self) -> None:
        """Reset hidden state to the learned initial hidden state for all rows."""
        self.hidden = network.initial_hidden(self.params, self.batch_size)

    def evaluate_step(self, observation) -> np.ndarray:
        """obs [B, 22] (or [22]) -> action [B, 4]; advances hidden state."""
        obs = jnp.asarray(observation, jnp.float32)
        squeeze = obs.ndim == 1
        if squeeze:
            obs = obs[None]
        if obs.shape[0] != self.hidden.shape[0]:
            # resize hidden to the incoming batch (fresh rows get h0)
            self.batch_size = obs.shape[0]
            self.reset()
        self.hidden, action = self._step(self.params, self.hidden, obs)
        out = np.asarray(action)
        return out[0] if squeeze else out
