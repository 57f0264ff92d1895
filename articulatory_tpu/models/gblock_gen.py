"""GAN-TTS/CARGAN-style GBlock generator.

Parity target: reference articulatory/models/gblock_gen.py (fixed channel
schedule, GBlocks with dilations 1/3/9/27, AR + speaker-id hooks).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from articulatory_tpu.layers.conv import Conv1d, Dense, Embed
from articulatory_tpu.layers.past_encoder import PastFCEncoder
from articulatory_tpu.layers.residual import GBlock

Array = jax.Array


class GBlockGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    g_scales: Sequence[int] = (8, 8, 2, 2)
    g_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    use_weight_norm: bool = True
    use_ar: bool = False
    ar_input: int = 512
    ar_hidden: int = 256
    ar_output: int = 128
    use_tanh: bool = True
    use_spk_id: bool = False
    num_spk: int | None = None
    spk_emb_size: int = 32

    @nn.compact
    def __call__(self, c: Array, spk_id: Array | None = None,
                 ar: Array | None = None, ph: Array | None = None) -> Array:
        assert self.kernel_size % 2 == 1, "Kernel size must be odd number."
        assert len(self.g_scales) == len(self.g_kernel_sizes)
        ch = self.channels
        # fixed schedule from the reference (gblock_gen.py:63-64)
        g_out_channels = [ch, ch, ch // 2, ch // 2, ch // 2, ch // 2,
                          ch // 4, ch // 4, ch // 8, ch // 8]

        if self.use_ar:
            ar_feats = PastFCEncoder(input_len=self.ar_input,
                                     hidden_dim=self.ar_hidden,
                                     output_dim=self.ar_output,
                                     name="ar_model")(ar)
            ar_feats = jnp.broadcast_to(ar_feats[:, None, :],
                                        (c.shape[0], c.shape[1], self.ar_output))
            c = jnp.concatenate([c, ar_feats], axis=-1)
        if self.use_spk_id:
            assert self.num_spk is not None
            spk_emb = Embed(self.num_spk, self.spk_emb_size, name="spk_emb_mat")(spk_id)
            spk_emb = Dense(self.in_channels, name="spk_fc")(spk_emb)
            c = c + spk_emb[:, None, :]

        # The reference builds GBlocks with norm=False but then wraps *every*
        # Conv1d (including GBlock convs) via apply_weight_norm, making the
        # post-norm N(0, 0.01) reset a no-op; without weight norm the reset
        # takes effect. Mirror both regimes.
        kinit = "torch_default" if self.use_weight_norm else "normal:0.01"
        c = Conv1d(self.channels, self.kernel_size,
                   padding=(self.kernel_size - 1) // 2,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init=kinit, name="input_conv")(c)
        for i in range(len(self.g_kernel_sizes)):
            c = GBlock(g_out_channels[i], upsample=self.g_scales[i],
                       kernel_size=self.g_kernel_sizes[i],
                       use_weight_norm=self.use_weight_norm,
                       name=f"resample_{i}")(c)
        c = jnp.where(c >= 0, c, 0.01 * c)  # LeakyReLU default slope
        c = Conv1d(self.out_channels, self.kernel_size,
                   padding=(self.kernel_size - 1) // 2,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init=kinit, name="output_conv")(c)
        if self.use_tanh:
            c = jnp.tanh(c)
        return c
