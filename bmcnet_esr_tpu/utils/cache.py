"""Persistent XLA compilation cache (large first-compile costs go through a
remote-compile tunnel on this TPU attachment; caching cuts cold starts from
~400 s to ~50 s)."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if cache_dir is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.join(repo, ".jax_cache")
        )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
