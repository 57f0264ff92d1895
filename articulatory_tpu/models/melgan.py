"""MelGAN generator & discriminators (reference: articulatory/models/melgan.py).

Fully-sequential ConvTranspose1d + residual-stack generator with reflection
padding; multi-scale discriminator with count_include_pad=False pooling.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.layers.activations import get_activation
from articulatory_tpu.layers.conv import (
    CausalConv1d,
    CausalConvTranspose1d,
    Conv1d,
    ConvTranspose1d,
)
from articulatory_tpu.layers.residual import MelGANResidualStack, pad_layer_to_mode

Array = jax.Array


def avg_pool1d(x: Array, kernel_size: int, stride: int, padding: int,
               count_include_pad: bool = True) -> Array:
    """torch.nn.AvgPool1d over NLC time axis."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    if count_include_pad:
        return summed / kernel_size
    ones = jnp.ones((1, x.shape[1], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    return summed / counts


class MelGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    kernel_size: int = 7
    channels: int = 512
    bias: bool = True
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    pad: str = "ReflectionPad1d"
    pad_params: dict = None
    use_final_nonlinear_activation: bool = True
    # NOTE: with use_weight_norm=False the reference's post-norm
    # N(0, 0.02) reset becomes effective; this port keeps torch
    # default init in that (rare, non-recipe) regime — see
    # hifigan.py/gblock_gen.py for the mirrored behavior.
    use_weight_norm: bool = True
    use_causal_conv: bool = False

    @nn.compact
    def __call__(self, c: Array, spk_id=None, ar=None, ph=None) -> Array:
        """(B, T, in_channels) -> (B, T * prod(upsample_scales), out_channels)."""
        assert self.channels >= np.prod(self.upsample_scales)
        assert self.channels % (2 ** len(self.upsample_scales)) == 0
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.2})
        pad_mode = pad_layer_to_mode(self.pad)

        if not self.use_causal_conv:
            assert (self.kernel_size - 1) % 2 == 0, "Not support even kernel size."
            x = Conv1d(self.channels, self.kernel_size,
                       padding=(self.kernel_size - 1) // 2, pad_mode=pad_mode,
                       use_bias=self.bias, use_weight_norm=self.use_weight_norm,
                       name="first_conv")(c)
        else:
            x = CausalConv1d(self.channels, self.kernel_size, use_bias=self.bias,
                             use_weight_norm=self.use_weight_norm,
                             name="first_conv")(c)

        for i, scale in enumerate(self.upsample_scales):
            ch = self.channels // (2 ** (i + 1))
            x = act(x)
            if not self.use_causal_conv:
                x = ConvTranspose1d(ch, scale * 2, stride=scale,
                                    padding=scale // 2 + scale % 2,
                                    output_padding=scale % 2, use_bias=self.bias,
                                    use_weight_norm=self.use_weight_norm,
                                    name=f"upsample_{i}")(x)
            else:
                x = CausalConvTranspose1d(ch, scale * 2, stride=scale,
                                          use_bias=self.bias,
                                          use_weight_norm=self.use_weight_norm,
                                          name=f"upsample_{i}")(x)
            for j in range(self.stacks):
                x = MelGANResidualStack(
                    kernel_size=self.stack_kernel_size, channels=ch,
                    dilation=self.stack_kernel_size ** j, use_bias=self.bias,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=(self.nonlinear_activation_params
                                                 or {"negative_slope": 0.2}),
                    pad=self.pad, pad_params=self.pad_params,
                    use_causal_conv=self.use_causal_conv,
                    use_weight_norm=self.use_weight_norm,
                    name=f"stack_{i}_{j}")(x)

        x = act(x)
        if not self.use_causal_conv:
            x = Conv1d(self.out_channels, self.kernel_size,
                       padding=(self.kernel_size - 1) // 2, pad_mode=pad_mode,
                       use_bias=self.bias, use_weight_norm=self.use_weight_norm,
                       name="last_conv")(x)
        else:
            x = CausalConv1d(self.out_channels, self.kernel_size,
                             use_bias=self.bias,
                             use_weight_norm=self.use_weight_norm,
                             name="last_conv")(x)
        if self.use_final_nonlinear_activation:
            x = jnp.tanh(x)
        return x


class MelGANDiscriminator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    bias: bool = True
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    pad: str = "ReflectionPad1d"
    pad_params: dict = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        assert len(self.kernel_sizes) == 2
        assert self.kernel_sizes[0] % 2 == 1 and self.kernel_sizes[1] % 2 == 1
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.2})
        pad_mode = pad_layer_to_mode(self.pad)
        outs = []
        k0 = int(np.prod(self.kernel_sizes))
        x = Conv1d(self.channels, k0, padding=(k0 - 1) // 2, pad_mode=pad_mode,
                   use_bias=self.bias, use_weight_norm=self.use_weight_norm,
                   name="layer_0")(x)
        x = act(x)
        outs.append(x)

        in_chs = self.channels
        li = 1
        for scale in self.downsample_scales:
            out_chs = min(in_chs * scale, self.max_downsample_channels)
            x = Conv1d(out_chs, scale * 10 + 1, stride=scale, padding=scale * 5,
                       groups=in_chs // 4, use_bias=self.bias,
                       use_weight_norm=self.use_weight_norm, name=f"layer_{li}")(x)
            x = act(x)
            outs.append(x)
            in_chs = out_chs
            li += 1

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        x = Conv1d(out_chs, self.kernel_sizes[0],
                   padding=(self.kernel_sizes[0] - 1) // 2, use_bias=self.bias,
                   use_weight_norm=self.use_weight_norm, name=f"layer_{li}")(x)
        x = act(x)
        outs.append(x)
        x = Conv1d(self.out_channels, self.kernel_sizes[1],
                   padding=(self.kernel_sizes[1] - 1) // 2, use_bias=self.bias,
                   use_weight_norm=self.use_weight_norm, name=f"layer_{li + 1}")(x)
        outs.append(x)
        return outs


class MelGANMultiScaleDiscriminator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    scales: int = 3
    downsample_pooling: str = "AvgPool1d"
    downsample_pooling_params: dict = None
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    bias: bool = True
    downsample_scales: Sequence[int] = (4, 4, 4, 4)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    pad: str = "ReflectionPad1d"
    pad_params: dict = None
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        pool = self.downsample_pooling_params or {
            "kernel_size": 4, "stride": 2, "padding": 1, "count_include_pad": False}
        outs = []
        for i in range(self.scales):
            outs.append(MelGANDiscriminator(
                in_channels=self.in_channels, out_channels=self.out_channels,
                kernel_sizes=self.kernel_sizes, channels=self.channels,
                max_downsample_channels=self.max_downsample_channels,
                bias=self.bias, downsample_scales=self.downsample_scales,
                nonlinear_activation=self.nonlinear_activation,
                nonlinear_activation_params=self.nonlinear_activation_params,
                pad=self.pad, pad_params=self.pad_params,
                use_weight_norm=self.use_weight_norm,
                name=f"disc_{i}")(x))
            x = avg_pool1d(x, pool["kernel_size"], pool["stride"], pool["padding"],
                           pool.get("count_include_pad", True))
        return outs
