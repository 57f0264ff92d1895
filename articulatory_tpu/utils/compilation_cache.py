"""Persistent XLA compilation cache setup.

Remote TPU compiles of the full GAN step take minutes; caching them on disk
makes every subsequent run (same config/topology) start instantly. Called by
the train/decode CLIs and bench; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None,
                             process_id: int | str | None = None) -> None:
    """``process_id``: multi-process rank when launched via CLI flags rather
    than the JAX_PROCESS_ID env var (bin/train.py --process-id)."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "ARTICULATORY_XLA_CACHE",
            os.path.expanduser("~/.cache/articulatory_tpu/xla"))
    # Multi-process CPU runs (distributed/launch.py local testing) must not
    # use the persistent cache at all: a rank that loads a cached executable
    # while another compiles fresh ends up with mismatched collective-context
    # ids, and the first cross-host CPU collective deadlocks in Gloo context
    # init (reproduced with 2-process CPU training: 30 s GetKeyValue timeout,
    # then AOT machine-feature mismatch warnings on reload). CPU compiles are
    # cheap anyway — the cache exists for multi-minute remote TPU compiles,
    # where per-host filesystems make this a non-issue.
    pid = os.environ.get("JAX_PROCESS_ID") if process_id is None else process_id
    if pid is not None:
        if "cpu" in os.environ.get("JAX_PLATFORMS", "").split(","):
            return
        cache_dir = os.path.join(cache_dir, f"proc{pid}")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass
