"""Persistent XLA compilation cache, scoped per platform + machine.

Supervisor restarts and repeated experiment launches otherwise pay the
full multi-minute first-compile of the actor/arena graphs on every fresh
process.  The cache directory is suffixed with the *resolved* backend
platform and a host fingerprint: round 3 shipped one shared directory and
CPU runs then loaded TPU-machine AOT entries (``cpu_aot_loader`` errors,
"could lead to SIGILL") — a cache meant to survive restarts must never
cross machines or platforms.

Called explicitly by the CLI and experiment drivers (NOT at package
import: importing ``alphazero_risk_tpu`` for ``Config`` alone must not
pull in jax or mutate global jax config — advisor round 3).
"""

from __future__ import annotations

import os


def setup_compile_cache() -> str | None:
    """Enable the persistent compile cache; returns the directory used.

    No-ops (returns None) when the embedding application already set
    ``jax_compilation_cache_dir`` itself, or when ``AZR_COMPILE_CACHE`` is
    set to the empty string.

    Initializes the jax backend (to resolve the actual platform), so call
    it from driver ``main()``s after any platform selection, never at
    import time.
    """
    import jax

    if jax.config.jax_compilation_cache_dir:
        return None  # respect an app-configured cache
    base = os.environ.get("AZR_COMPILE_CACHE",
                          os.path.expanduser("~/.cache/azr-jax"))
    if not base:
        return None
    platform = jax.default_backend()  # resolved, post platform selection
    if platform == "cpu" and not os.environ.get("AZR_COMPILE_CACHE_CPU"):
        # XLA:CPU AOT reload prints machine-feature-mismatch errors even
        # on the SAME machine (it bakes +prefer-no-scatter/gather pseudo-
        # features into the compile feature list that never appear in the
        # host list), and genuinely risks SIGILL across container resets
        # that change the underlying CPU.  CPU compiles are cheap; only
        # accelerator graphs are worth persisting.
        return None
    host = os.uname().nodename
    cache = os.path.join(base, f"{platform}-{host}")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache
