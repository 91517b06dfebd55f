"""Persistent XLA compile cache setup.

The axon-tunnel TPU compile path costs minutes per program; the persistent
cache makes every run after the first instant. Called by the CLI apps and
bench; safe to call repeatedly."""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        cache_dir = os.path.join(repo_root, ".cache", "xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jaxlib without the knobs
