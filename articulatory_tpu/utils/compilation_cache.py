"""Persistent XLA compilation cache setup.

Remote TPU compiles of the full GAN step take minutes; caching them on disk
makes every subsequent run (same config/topology) start instantly. Called by
the train/decode CLIs and bench; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "ARTICULATORY_XLA_CACHE",
            os.path.expanduser("~/.cache/articulatory_tpu/xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass
