"""Parallel WaveGAN generator & discriminators.

Parity target: reference articulatory/models/parallel_wavegan.py. The
generator is a 30-layer WaveNet conditioned on upsampled aux features,
driven by a noise input; the inference path draws z ~ N(0, 1).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.layers.activations import get_activation
from articulatory_tpu.layers.conv import Conv1d
from articulatory_tpu.layers.residual import WaveNetResidualBlock
from articulatory_tpu.layers.upsample import ConvInUpsampleNetwork, UpsampleNetwork

Array = jax.Array


class ParallelWaveGANGenerator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    upsample_conditional_features: bool = True
    upsample_net: str = "ConvInUpsampleNetwork"
    upsample_params: dict = None

    @property
    def upsample_factor(self) -> int:
        if not self.upsample_conditional_features:
            return 1
        params = self.upsample_params or {"upsample_scales": [4, 4, 4, 4]}
        return int(np.prod(params["upsample_scales"]))

    @property
    def receptive_field_size(self) -> int:
        layers_per_cycle = self.layers // self.stacks
        dilations = [2 ** (i % layers_per_cycle) for i in range(self.layers)]
        return (self.kernel_size - 1) * sum(dilations) + 1

    @nn.compact
    def __call__(self, x: Array, c: Array | None, *, deterministic: bool = True
                 ) -> Array:
        """x: noise (B, T, 1); c: aux features (B, T', aux_channels) -> (B, T, out)."""
        assert self.layers % self.stacks == 0
        layers_per_stack = self.layers // self.stacks
        params = dict(self.upsample_params or {"upsample_scales": [4, 4, 4, 4]})

        if c is not None and self.upsample_conditional_features:
            params["use_causal_conv"] = self.use_causal_conv
            if self.upsample_net == "ConvInUpsampleNetwork":
                c = ConvInUpsampleNetwork(
                    aux_channels=self.aux_channels,
                    aux_context_window=self.aux_context_window,
                    use_weight_norm=self.use_weight_norm,
                    **params, name="upsample_net")(c)
            elif self.upsample_net == "UpsampleNetwork":
                c = UpsampleNetwork(**params, name="upsample_net")(c)
            else:
                raise ValueError(f"Unsupported upsample_net: {self.upsample_net}")
            assert c.shape[1] == x.shape[1]

        x = Conv1d(self.residual_channels, 1, use_bias=True,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init="kaiming_normal_relu", bias_init="zeros",
                   name="first_conv")(x)
        skips = 0.0
        for layer in range(self.layers):
            dilation = 2 ** (layer % layers_per_stack)
            x, h = WaveNetResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=self.aux_channels,
                dilation=dilation, dropout=self.dropout, use_bias=self.bias,
                use_causal_conv=self.use_causal_conv,
                use_weight_norm=self.use_weight_norm,
                name=f"conv_layer_{layer}")(x, c, deterministic=deterministic)
            skips += h
        skips *= math.sqrt(1.0 / self.layers)

        x = jax.nn.relu(skips)
        x = Conv1d(self.skip_channels, 1, use_bias=True,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init="kaiming_normal_relu", bias_init="zeros",
                   name="last_conv_0")(x)
        x = jax.nn.relu(x)
        x = Conv1d(self.out_channels, 1, use_bias=True,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init="kaiming_normal_relu", bias_init="zeros",
                   name="last_conv_1")(x)
        return x


class ParallelWaveGANDiscriminator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 10
    conv_channels: int = 64
    dilation_factor: int = 1
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    bias: bool = True
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert (self.kernel_size - 1) % 2 == 0
        assert self.dilation_factor > 0
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.2})
        for i in range(self.layers - 1):
            dilation = 1 if i == 0 else (
                i if self.dilation_factor == 1 else self.dilation_factor ** i)
            x = Conv1d(self.conv_channels, self.kernel_size,
                       padding=(self.kernel_size - 1) // 2 * dilation,
                       dilation=dilation, use_bias=self.bias,
                       use_weight_norm=self.use_weight_norm,
                       kernel_init="kaiming_normal_relu", bias_init="zeros",
                       name=f"conv_{i}")(x)
            x = act(x)
        x = Conv1d(self.out_channels, self.kernel_size,
                   padding=(self.kernel_size - 1) // 2, use_bias=self.bias,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init="kaiming_normal_relu", bias_init="zeros",
                   name=f"conv_{self.layers - 1}")(x)
        return x


class ResidualParallelWaveGANDiscriminator(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    use_causal_conv: bool = False
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        assert (self.kernel_size - 1) % 2 == 0
        assert self.layers % self.stacks == 0
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.2})
        layers_per_stack = self.layers // self.stacks
        x = Conv1d(self.residual_channels, 1, use_bias=True,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init="kaiming_normal_relu", bias_init="zeros",
                   name="first_conv")(x)
        x = act(x)
        skips = 0.0
        for layer in range(self.layers):
            dilation = 2 ** (layer % layers_per_stack)
            x, h = WaveNetResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=-1, dilation=dilation, dropout=self.dropout,
                use_bias=self.bias, use_causal_conv=self.use_causal_conv,
                use_weight_norm=self.use_weight_norm,
                name=f"conv_layer_{layer}")(x, None, deterministic=deterministic)
            skips += h
        skips *= math.sqrt(1.0 / self.layers)

        x = act(skips)
        x = Conv1d(self.skip_channels, 1, use_bias=True,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init="kaiming_normal_relu", bias_init="zeros",
                   name="last_conv_0")(x)
        x = act(x)
        x = Conv1d(self.out_channels, 1, use_bias=True,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init="kaiming_normal_relu", bias_init="zeros",
                   name="last_conv_1")(x)
        return x
