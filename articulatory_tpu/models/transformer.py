"""Gaddy & Klein silent-speech Transformer (reference:
articulatory/models/transformer.py). ResBlock conv frontend + 6 relative-pos
encoder layers, NLC layout throughout."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from articulatory_tpu.layers.conv import Conv1d, Dense, Embed
from articulatory_tpu.layers.residual import ResBlock
from articulatory_tpu.layers.transformer import TransformerEncoderLayer

Array = jax.Array


class Transformer(nn.Module):
    in_channels: int = 8
    out_channels: int = 80
    elayers: int = 6
    hidden_dim: int = 768
    dropout: float = 0.2
    extra_art: bool = False
    use_ar: bool = False
    ar_input: int = 512
    ar_hidden: int = 256
    ar_output: int = 128
    use_tanh: bool = False
    num_ph: int | None = None
    ph_emb_size: int = 8
    layer_type: str = "default"

    @nn.compact
    def __call__(self, x: Array, spk_id=None, ar=None, ph=None, *,
                 train: bool = False) -> Array:
        """x: (B, T, in_channels) features, or (B, T) int phoneme ids when
        num_ph is set. Returns (B, T', out_channels) (T' = T - 1 with
        extra_art due to the kernel-2 front conv)."""
        assert self.layer_type == "default"
        if self.num_ph is not None:
            x = Embed(self.num_ph, self.ph_emb_size, name="in_emb_mat")(x)
        if self.extra_art:
            # kernel-2 conv without padding shortens T by 1
            x = Conv1d(self.hidden_dim, 2, use_weight_norm=True,
                       name="front_conv")(x)
        for i in range(3):
            x = ResBlock(self.hidden_dim, stride=1, name=f"res{i}")(x, train=train)
        x = Dense(self.hidden_dim, name="w_raw_in")(x)
        for i in range(self.elayers):
            x = TransformerEncoderLayer(
                d_model=self.hidden_dim, nhead=8, dim_feedforward=3072,
                dropout=self.dropout, relative_positional=True,
                relative_positional_distance=100,
                name=f"layer{i}")(x, deterministic=not train)
        # NOTE: the reference accepts use_tanh but never applies it in forward
        # (transformer.py:56-77); mirrored here.
        return Dense(self.out_channels, name="w_out")(x)
