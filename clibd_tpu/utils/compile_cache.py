"""Persistent XLA compilation cache (opt-in).

A resident server restart (or any CLI re-invocation) re-pays every XLA
compile: measured on the flagship extraction program, 129 s cold vs
**7.0 s** with a warm on-disk cache (third process; the intermediate run
still compiles the handful of sub-programs whose fingerprints include
first-run-only state).  The reference has no analogue — its torch eager
path doesn't compile — so this is pure TPU-era operational surface:
enable it wherever process restarts matter (serving, cron extractions,
iterative eval runs).

Opt-in, not default: the cache grows on disk unboundedly (XLA does not
evict) and is keyed to the exact jaxlib/backend build, so a shared or
long-lived directory is an operator decision.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable the persistent compilation cache if configured.

    path argument (e.g. `clibd serve --compile-cache DIR`) wins; otherwise
    the CLIBD_COMPILE_CACHE environment variable (honored by every CLI
    subcommand and bench.py).  Returns the resolved directory, or None if
    not configured.  Must run before the first jit compilation; safe to
    call repeatedly (jax.config updates are idempotent) and touches only
    process-local config, never the backend.
    """
    path = path or os.environ.get("CLIBD_COMPILE_CACHE")
    if not path:
        return None
    import jax

    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default threshold (1 s) skips small programs; through a tunnel (or on
    # a loaded host) even sub-second compiles are worth persisting
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
