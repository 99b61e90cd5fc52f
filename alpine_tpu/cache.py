"""Persistent XLA compilation cache.

TPU compiles of the fit scan take tens of seconds (minutes through remote
tunnels); with the persistent cache a fresh process reuses them (measured
here: 292s cold -> 1.7s warm across processes).  Enabled automatically on
first model/engine use unless:

- the user already configured a cache (JAX_COMPILATION_CACHE_DIR env or
  jax_compilation_cache_dir config), or
- ALPINE_TPU_NO_CACHE is set.

Default location: $ALPINE_TPU_CACHE_DIR or ~/.cache/alpine_tpu/xla.
"""

from __future__ import annotations

import os

_done = False


def env_flag(name: str) -> bool:
    """Boolean env-var parsing shared by all ALPINE_TPU_* switches:
    unset/''/'0'/'false' (any case) mean OFF.  A bare truthiness check
    would treat FLAG=0 as on — the opposite of what users mean."""
    return os.environ.get(name, "").lower() not in ("", "0", "false")


def enable_compilation_cache(allow_backend_check: bool = False) -> None:
    """Idempotently point JAX's persistent compilation cache at a per-user
    directory (no-op if the user configured their own or opted out).

    CPU compiles are fast and CPU AOT cache entries produce noisy
    machine-feature-mismatch warnings across flag changes, so caching is
    enabled only for accelerator platforms.  When the platform cannot be
    read without initializing backends (jax_platforms unset), the decision
    is DEFERRED unless allow_backend_check=True (call sites that know
    backends are already initialized, e.g. after resolve_device)."""
    global _done
    if _done:
        return
    if env_flag("ALPINE_TPU_NO_CACHE"):
        _done = True
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir is not None:
            _done = True
            return  # user-configured; leave alone
        platforms = (jax.config.jax_platforms or "").strip()
        if platforms == "cpu":
            _done = True
            return
        if not platforms:
            # platform unknown without initializing backends
            if not allow_backend_check:
                return  # stay undecided; a later call may resolve it
            if jax.default_backend() == "cpu":
                _done = True
                return
        _done = True
        path = os.environ.get(
            "ALPINE_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "alpine_tpu", "xla"),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # fit-scan compiles are always worth caching; the default 1s floor
        # already filters trivial ops
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # caching is an optimization; never fail a fit over it
