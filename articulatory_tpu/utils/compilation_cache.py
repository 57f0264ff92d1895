"""Persistent XLA compilation cache setup.

Remote TPU compiles of the full GAN step take minutes; caching them on disk
makes every subsequent run (same config/topology) start instantly. Called by
the train/decode CLIs and bench; safe to call multiple times.

The cache directory is keyed on the backend's ``platform_version`` (the
libtpu build string on TPU backends): round 1 died with ``FAILED_PRECONDITION:
libtpu version mismatch`` when the terminal's libtpu rolled under a cache
full of AOT executables built against the previous build. Keying the
directory on the build string makes a roll land in a fresh, empty cache
instead of replaying stale executables.
"""

from __future__ import annotations

import hashlib
import os


def _platform_fingerprint() -> str | None:
    """Short hash of the default backend's platform version (libtpu build).

    Returns None for CPU backends (no AOT-staleness hazard, and multi-process
    CPU runs must not touch the persistent cache at all) or when the backend
    cannot be probed.
    """
    try:
        import jax
        from jax.extend import backend as jex_backend

        backend = jex_backend.get_backend()
        if backend.platform == "cpu":
            return None
        version = getattr(backend, "platform_version", "") or ""
        blob = f"{backend.platform}:{version}:{jax.__version__}"
        return hashlib.sha1(blob.encode()).hexdigest()[:10]
    except Exception:
        return None


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
    # where per-host filesystems make this a non-issue. The check must be the
    # *resolved default backend*, not a substring test on JAX_PLATFORMS: a
    # TPU run launched with JAX_PLATFORMS="axon,cpu" (the documented way to
    # keep a CPU backend available) still runs on the TPU and needs the cache.
    fingerprint = _platform_fingerprint()
    if fingerprint is None:
        # Default backend is CPU (or unprobeable): never persist. Besides the
        # Gloo deadlock above, CPU AOT executables are machine-feature
        # specific — a cache written on one host loads on another with
        # "Target machine feature ... not supported on the host machine ...
        # could lead to execution errors such as SIGILL" (observed when the
        # test-suite cache outlived its build host).
        return
    pid = os.environ.get("JAX_PROCESS_ID") if process_id is None else process_id
    if pid is not None:
        cache_dir = os.path.join(cache_dir, f"proc{pid}")
    cache_dir = os.path.join(cache_dir, fingerprint)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass
