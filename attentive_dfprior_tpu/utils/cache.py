"""Persistent XLA compilation cache for the CLI entry points.

The scanned mapping/tracking step graphs take tens of seconds to compile;
caching them across processes makes repeated CLI invocations (get_tsdf,
run, eval) start fast. Off by setting DFPRIOR_COMPILE_CACHE=0.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("DFPRIOR_COMPILE_CACHE", "1") == "0":
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DFPRIOR_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "dfprior_jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these options
