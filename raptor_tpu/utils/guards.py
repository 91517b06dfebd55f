"""Failure detection: NaN/divergence guards for long-running training.

TPU training failure modes (NaN blowups, diverged replay, dead envs) are
cheapest to catch host-side between jitted super-steps. `check_pytree`
scans a state pytree for non-finite leaves; `FailureDetectionStep` plugs
into the loop-steps chain and either raises or rolls back to the last good
state snapshot (pairing with utils.state_checkpoint for preemption-safe
recovery).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def nonfinite_leaves(tree: Any, max_report: int = 8) -> List[str]:
    """Names of pytree paths containing non-finite values (empty = healthy)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        if not bool(jnp.all(jnp.isfinite(leaf))):
            bad.append(jax.tree_util.keystr(path))
            if len(bad) >= max_report:
                break
    return bad


def check_pytree(tree: Any, what: str = "state") -> None:
    bad = nonfinite_leaves(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: {bad}")


class DivergenceError(RuntimeError):
    pass


class FailureDetectionStep:
    """Loop step: every `every_iters`, check metrics + (optionally) the
    trainer state for non-finite values; on failure, restore the last good
    snapshot if a restore_fn is provided, else raise DivergenceError."""

    def __init__(
        self,
        every_iters: int = 10,
        check_state: bool = False,
        snapshot_fn: Optional[Callable[[Any], None]] = None,
        restore_fn: Optional[Callable[[], Any]] = None,
        max_restores: int = 3,
    ):
        self.every_iters = every_iters
        self.check_state = check_state
        self.snapshot_fn = snapshot_fn
        self.restore_fn = restore_fn
        self.max_restores = max_restores
        self.restores = 0

    def __call__(self, holder, run=None):
        if holder.iteration % self.every_iters:
            return
        bad = []
        if holder.last_metrics is not None:
            m = holder.last_metrics
            values = m._asdict() if hasattr(m, "_asdict") else (
                m if isinstance(m, dict) else {}
            )
            for k, v in values.items():
                try:
                    if not np.all(np.isfinite(np.asarray(v))):
                        bad.append(f"metrics.{k}")
                except TypeError:
                    continue
        if self.check_state and not bad:
            bad = [f"state{p}" for p in nonfinite_leaves(holder.state)]

        if not bad:
            if self.snapshot_fn is not None:
                self.snapshot_fn(holder.state)
            return

        if run is not None:
            run.log({"failure/nonfinite": 1.0}, holder.total_env_steps)
        if self.restore_fn is not None and self.restores < self.max_restores:
            holder.state = self.restore_fn()
            self.restores += 1
            return
        raise DivergenceError(f"training diverged: non-finite {bad}")
