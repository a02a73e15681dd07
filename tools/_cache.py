"""Shared opt-in persistent XLA compile cache for the bench/kscan tools.

Through the device tunnel every fresh process pays multi-minute remote
compiles for the same programs; TPUBODY_COMPILE_CACHE=dir makes repeat
tool runs near-instant (same contract as tpubody.cli).
"""
from __future__ import annotations

import os


def enable() -> None:
    cache_dir = os.environ.get("TPUBODY_COMPILE_CACHE")
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
