"""Platform selection that survives pre-main jax imports.

Some environments (e.g. the axon TPU relay used here) register a PJRT plugin
from ``sitecustomize`` — jax is imported and the platform pinned before user
code runs, so setting ``JAX_PLATFORMS`` in a child's env is silently ignored.
``apply_platform_env()`` re-applies the env var through ``jax.config`` and
must be called at the top of every process ``main()`` that wants to honor it.
"""

from __future__ import annotations

import os


def apply_platform_env(default: str | None = None) -> str | None:
    """Force jax onto the platform named by $JAX_PLATFORMS (or ``default``).

    Returns the platform applied, or None if left untouched.  Safe to call
    before or after jax import, but only effective before backend init.
    """
    want = os.environ.get("JAX_PLATFORMS") or default
    if not want:
        return None
    try:
        import jax

        jax.config.update("jax_platforms", want)
        return want
    except Exception:  # noqa: BLE001 — jax absent or backends already initialized
        return None


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on jax's persistent compilation cache (cold-start item: Mosaic
    compiles run minutes on remote TPU runtimes; the cache makes them
    one-time per machine).  $JAX_COMPILATION_CACHE_DIR overrides."""
    target = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
              or "/tmp/jax_comp_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
