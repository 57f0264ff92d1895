"""Linear time interpolation matching torch.nn.functional.interpolate
(mode='linear', align_corners=False) over NLC tensors."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_linear(x: jax.Array, size: int) -> jax.Array:
    """x: (B, T, C) -> (B, size, C)."""
    t_in = x.shape[1]
    # torch half-pixel mapping
    pos = (jnp.arange(size, dtype=jnp.float32) + 0.5) * (t_in / size) - 0.5
    pos = jnp.clip(pos, 0.0, t_in - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = (pos - lo)[None, :, None]
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w


def interpolate_linear_scale(x: jax.Array, scale_factor: float) -> jax.Array:
    """torch F.interpolate(scale_factor=...) semantics: out = floor(T * scale)."""
    return interpolate_linear(x, int(x.shape[1] * scale_factor))
