"""Persistent XLA/Mosaic compilation cache setup.

The cache is load-bearing on tunneled-TPU hosts: compiles are served
serially by a remote helper at 2-15 min per Mosaic kernel, while a
warm cache hit costs ~0.02 s. `bench.py` and every `tools/` script
route through this one helper so the directory and thresholds cannot
drift between them.
"""

import os


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Point jax at the repo-local .jax_cache (or `cache_dir`) with
    zero-size/zero-time thresholds; silently a no-op on jax versions
    or backends without these config names."""
    import jax

    try:
        if cache_dir is None:
            cache_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache",
            )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # cache unsupported: compile as usual
