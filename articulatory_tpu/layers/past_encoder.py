"""Autoregressive-context encoders (CARGAN conditioning).

Parity targets: ``PastFCEncoder`` (reference:
articulatory/layers/pytorch_layers.py:426-461) — flatten the past samples
channel-major and run a 4-layer LeakyReLU MLP; ``PastSeqEncoder``
(pytorch_layers.py:464-489) — ResBlock frontend + transformer encoder.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from articulatory_tpu.layers.conv import Dense
from articulatory_tpu.layers.residual import ResBlock
from articulatory_tpu.layers.transformer import TransformerEncoderLayer

Array = jax.Array


class PastFCEncoder(nn.Module):
    """MLP over flattened past samples: (B, P, C) -> (B, output_dim).

    The flatten is channel-major (all samples of channel 0, then channel 1,
    ...) to match the reference's ``x.reshape(B, -1)`` on (B, C, P) input, so
    imported reference checkpoints produce identical outputs.
    """

    input_len: int = 512
    hidden_dim: int = 256
    output_dim: int = 128

    @nn.compact
    def __call__(self, ar: Array) -> Array:
        b = ar.shape[0]
        x = jnp.swapaxes(ar, 1, 2).reshape(b, -1)  # channel-major flatten
        x = Dense(self.hidden_dim, name="fc0")(x)
        x = jnp.where(x >= 0, x, 0.1 * x)
        for i in range(3):
            x = Dense(self.hidden_dim, name=f"fc{i + 1}")(x)
            x = jnp.where(x >= 0, x, 0.1 * x)
        return Dense(self.output_dim, name="fc4")(x)


class PastSeqEncoder(nn.Module):
    """ResBlock + transformer over past samples: (B, P, 1) -> (B, P, output_dim)."""

    output_dim: int = 128
    dropout: float = 0.2
    elayers: int = 2
    ffdim: int = 512

    @nn.compact
    def __call__(self, ar: Array, *, train: bool = False) -> Array:
        x = ResBlock(self.output_dim, stride=1, name="res0")(ar, train=train)
        for i in range(self.elayers):
            x = TransformerEncoderLayer(
                d_model=self.output_dim, nhead=8, dim_feedforward=self.ffdim,
                dropout=self.dropout, relative_positional=True,
                relative_positional_distance=100, name=f"layer{i}",
            )(x, deterministic=not train)
        return x
