"""Persistent XLA compilation cache.

First-compile of the classify pipeline costs tens of seconds on TPU
(SURVEY.md notes the reference pays nothing — nvcc compiles ahead of
time). A persistent cache gives the same ahead-of-time feel: every CLI
invocation after the first reuses the compiled executables.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable() -> None:
    global _ENABLED
    if _ENABLED:
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "TPUBROT_JAX_CACHE",
            os.path.join(
                os.path.dirname(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                ),
                ".jax_cache",
            ),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _ENABLED = True
