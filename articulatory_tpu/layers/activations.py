"""Activation resolver mirroring the reference's ``getattr(torch.nn, name)(**params)``
pattern (reference: hifigan.py:121, melgan.py:73)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def get_activation(name: str, params: dict | None = None) -> Callable[[jax.Array], jax.Array]:
    params = params or {}
    if name == "LeakyReLU":
        slope = params.get("negative_slope", 0.01)
        return lambda x: jnp.where(x >= 0, x, x * slope)
    if name == "ReLU":
        return jax.nn.relu
    if name == "Tanh":
        return jnp.tanh
    if name == "GELU":
        # torch.nn.GELU() default is the exact erf form, not tanh approx
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "ELU":
        alpha = params.get("alpha", 1.0)
        return lambda x: jax.nn.elu(x, alpha)
    if name == "SELU":
        return jax.nn.selu
    if name == "Softplus":
        beta = params.get("beta", 1.0)
        threshold = params.get("threshold", 20.0)

        def softplus(x):
            z = beta * x
            # clamp the exp argument BEFORE evaluating: jnp.where cannot
            # mask an inf produced in the unselected branch from the
            # backward pass (classic where-grad NaN pitfall)
            safe = jnp.where(z > threshold, 0.0, z)
            return jnp.where(z > threshold, x, jnp.log1p(jnp.exp(safe)) / beta)

        return softplus
    if name == "Sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"Unsupported activation: {name}")
