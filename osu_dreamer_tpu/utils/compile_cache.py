"""Persistent XLA compile-cache enablement that works under plugin sitecustomize.

Setting ``JAX_COMPILATION_CACHE_DIR`` in ``os.environ`` before importing jax
is the documented way to enable the persistent compile cache — but a TPU
plugin installed via ``sitecustomize`` imports jax at interpreter start,
snapshotting the env BEFORE any application code runs. Every env-var
``setdefault`` in this repo was silently ineffective in that environment:
each CLI invocation paid the full pipeline compile again (~20 s on the
bench host; the cache dir was never even created).

``enable_compile_cache`` covers both worlds: it sets the env vars (the
jax-not-yet-imported case) AND, when jax is already imported, applies the
same values through ``jax.config.update``. An explicit user-set
``JAX_COMPILATION_CACHE_DIR`` always wins.
"""

from __future__ import annotations

import os
import sys


def default_cache_dir() -> str:
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "osu_dreamer_tpu", "jax",
    )


def enable_compile_cache(
    cache_dir: str | None = None, min_compile_secs: float = 1.0
) -> str:
    """enable the persistent XLA compile cache; returns the directory used"""
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir or default_cache_dir()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    os.environ.setdefault(
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", str(min_compile_secs)
    )
    if "jax" in sys.modules:
        import jax

        # only fill in unset values: an explicit jax.config.update by the
        # embedding application must not be overridden
        if getattr(jax.config, "jax_compilation_cache_dir", None) is None:
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", float(
                    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]
                )
            )
    return path
