"""StyleMelGAN generator & discriminator.

Parity target: reference articulatory/models/style_melgan.py. The generator
upsamples a noise vector through ConvTranspose1d stages and modulates it
with TADE residual blocks conditioned on aux features; the discriminator
evaluates random windows through per-resolution PQMF analyses.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.layers.activations import get_activation
from articulatory_tpu.layers.conv import Conv1d, ConvTranspose1d
from articulatory_tpu.layers.tade import TADEResBlock
from articulatory_tpu.models.melgan import MelGANDiscriminator
from articulatory_tpu.ops.pqmf import PQMF

Array = jax.Array


class StyleMelGANGenerator(nn.Module):
    in_channels: int = 128
    aux_channels: int = 80
    channels: int = 64
    out_channels: int = 1
    kernel_size: int = 9
    dilation: int = 2
    bias: bool = True
    noise_upsample_scales: Sequence[int] = (11, 2, 2, 2)
    noise_upsample_activation: str = "LeakyReLU"
    noise_upsample_activation_params: dict = None
    upsample_scales: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 1)
    upsample_mode: str = "nearest"
    gated_function: str = "softmax"
    # NOTE: with use_weight_norm=False the reference's post-norm
    # N(0, 0.02) reset becomes effective; this port keeps torch
    # default init in that (rare, non-recipe) regime — see
    # hifigan.py/gblock_gen.py for the mirrored behavior.
    use_weight_norm: bool = True

    @property
    def noise_upsample_factor(self) -> int:
        return int(np.prod(self.noise_upsample_scales))

    @property
    def upsample_factor(self) -> int:
        return int(np.prod(self.upsample_scales))

    @nn.compact
    def __call__(self, c: Array, z: Array | None = None) -> Array:
        """c: aux (B, T, aux_channels); z: noise (B, 1, in_channels) or None.

        Returns (B, T * noise_up * up... , out_channels) — in training use,
        T is chosen so noise_upsample output length matches c's length.
        """
        act = get_activation(self.noise_upsample_activation,
                             self.noise_upsample_activation_params
                             or {"negative_slope": 0.2})
        if z is None:
            z = jax.random.normal(self.make_rng("noise"),
                                  (c.shape[0], 1, self.in_channels), c.dtype)
        x = z
        for i, scale in enumerate(self.noise_upsample_scales):
            x = ConvTranspose1d(self.channels, scale * 2, stride=scale,
                                padding=scale // 2 + scale % 2,
                                output_padding=scale % 2, use_bias=self.bias,
                                use_weight_norm=self.use_weight_norm,
                                name=f"noise_upsample_{i}")(x)
            x = act(x)

        aux = c
        for i, scale in enumerate(self.upsample_scales):
            x, aux = TADEResBlock(
                in_channels=self.channels,
                aux_channels=self.aux_channels if i == 0 else self.channels,
                kernel_size=self.kernel_size, dilation=self.dilation,
                use_bias=self.bias, upsample_factor=scale,
                upsample_mode=self.upsample_mode,
                gated_function=self.gated_function,
                name=f"block_{i}")(x, aux)

        x = Conv1d(self.out_channels, self.kernel_size,
                   padding=(self.kernel_size - 1) // 2, use_bias=self.bias,
                   use_weight_norm=self.use_weight_norm, name="output_conv")(x)
        return jnp.tanh(x)

    def inference_padded_length(self, t: int) -> tuple[int, int]:
        """Return (noise_frames, padded_aux_length) for a t-frame aux input,
        matching the reference's pop-noise-avoiding padding (style_melgan.py:201-243)."""
        noise_frames = math.ceil(t / self.noise_upsample_factor)
        return noise_frames, noise_frames * self.noise_upsample_factor


class StyleMelGANDiscriminator(nn.Module):
    """Random-window multi-PQMF-band discriminator.

    Needs an 'window' rng stream for the random window starts.
    """

    repeats: int = 2
    window_sizes: Sequence[int] = (512, 1024, 2048, 4096)
    pqmf_params: Sequence[Sequence] = (
        (1, None, None, None),
        (2, 62, 0.26700, 9.0),
        (4, 62, 0.14200, 9.0),
        (8, 62, 0.07949, 9.0),
    )
    discriminator_params: dict = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        assert len(self.window_sizes) == len(self.pqmf_params)
        sizes = [ws // p[0] for ws, p in zip(self.window_sizes, self.pqmf_params)]
        assert all(s == sizes[0] for s in sizes)
        base = dict(self.discriminator_params or {
            "out_channels": 1, "kernel_sizes": [5, 3], "channels": 16,
            "max_downsample_channels": 512, "bias": True,
            "downsample_scales": [4, 4, 4, 1],
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.2},
            "pad": "ReflectionPad1d", "pad_params": {}})

        discs = []
        for idx, pq in enumerate(self.pqmf_params):
            d = dict(base)
            d["in_channels"] = pq[0]
            discs.append(MelGANDiscriminator(
                **d, use_weight_norm=self.use_weight_norm, name=f"disc_{idx}"))

        outs = []
        for _ in range(self.repeats):
            for idx, (ws, pq) in enumerate(zip(self.window_sizes, self.pqmf_params)):
                # the reference's np.random.randint raises for T <= ws; a
                # jax randint over an empty/negative range is silently
                # undefined, so guard explicitly (trace-time shape check)
                if x.shape[1] <= ws:
                    raise ValueError(
                        f"input length {x.shape[1]} must exceed the largest "
                        f"random window size {ws} (batch_max_steps too small)")
                key = self.make_rng("window")
                start = jax.random.randint(key, (), 0, x.shape[1] - ws)
                x_ = jax.lax.dynamic_slice_in_dim(x, start, ws, axis=1)
                if pq[0] != 1:
                    x_ = PQMF(subbands=pq[0], taps=pq[1], cutoff_ratio=pq[2],
                              beta=pq[3]).analysis(x_)
                outs.append(discs[idx](x_))
        return outs
