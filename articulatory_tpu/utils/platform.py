"""JAX platform selection helper for the CLI entry points.

A sitecustomize (e.g. the axon TPU plugin's) may import jax at interpreter
startup, after which the ``JAX_PLATFORMS`` env var is frozen — a user
setting ``JAX_PLATFORMS=cpu`` on a TPU host would be silently ignored and
the CLI would grab the (single-tenant) TPU. Only ``jax.config.update``
still takes effect at that point; every CLI calls this helper first.
"""

from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    """Re-apply the JAX_PLATFORMS env var via jax.config (late-import safe).

    A CPU backend is kept available alongside whatever the user asked for,
    so cheap init-time compiles can run on host (bin/train.py uses this).
    """
    plat = os.environ.get("JAX_PLATFORMS", "")
    if not plat:
        return
    import jax

    if "cpu" not in plat.split(","):
        plat = plat + ",cpu"
    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # a backend is already initialized; nothing safe to do
