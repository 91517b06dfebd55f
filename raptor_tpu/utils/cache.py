"""Persistent XLA compile cache setup.

The axon-tunnel TPU compile path costs minutes per program; the persistent
cache makes every run after the first instant. Called by the CLI apps and
bench; safe to call repeatedly."""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax

    # Platform override: JAX_PLATFORMS is ignored on machines whose
    # sitecustomize pre-registers a backend, so honor RAPTOR_PLATFORM here
    # (before any backend is touched) for CLI runs that want CPU.
    platform = os.environ.get("RAPTOR_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass

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
