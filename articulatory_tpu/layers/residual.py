"""Residual building blocks (NLC layout).

Behavioral parity targets:
- ``HiFiGANResidualBlock`` — reference articulatory/layers/residual_block.py:141-222
- ``WaveNetResidualBlock`` — reference articulatory/layers/residual_block.py:41-138
- ``MelGANResidualStack`` — reference articulatory/layers/residual_stack.py:13-85
- ``ResBlock`` (conv-BN, Gaddy&Klein) — reference articulatory/layers/pytorch_layers.py:94-125
- ``GBlock`` (GAN-TTS/CARGAN) — reference articulatory/layers/pytorch_layers.py:32-91
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from articulatory_tpu.layers.activations import get_activation
from articulatory_tpu.layers.conv import CausalConv1d, Conv1d

Array = jax.Array


def pad_layer_to_mode(pad: str) -> str:
    """Map torch pad-layer class names to Conv1d pad_mode strings."""
    return {
        "ReflectionPad1d": "reflect",
        "ReplicationPad1d": "replicate",
        "ConstantPad1d": "zeros",
    }.get(pad, "zeros")


class HiFiGANResidualBlock(nn.Module):
    """Multi-dilation residual block: per dilation, x += conv2(act(conv1(act(x))))."""

    kernel_size: int = 3
    channels: int = 512
    dilations: Sequence[int] = (1, 3, 5)
    use_bias: bool = True
    use_additional_convs: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    use_weight_norm: bool = True
    kernel_init: str = "torch_default"
    compute_dtype: object = None
    # >1: input/output are time-packed (B, T/p, p*channels) and the convs run
    # through the space-to-depth transform (ops/packed_conv.py) — numerically
    # identical, ~p x better MXU lane utilization for narrow channels
    time_pack: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.kernel_size % 2 == 1, "Kernel size must be odd number."
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.1})
        for i, dilation in enumerate(self.dilations):
            xt = self._conv(f"convs1_{i}", act(x), dilation)
            if self.use_additional_convs:
                xt = self._conv(f"convs2_{i}", act(xt), 1)
            x = xt + x
        return x

    def _conv(self, name: str, x: Array, dilation: int) -> Array:
        if self.time_pack <= 1:
            return Conv1d(self.channels, self.kernel_size, dilation=dilation,
                          padding=(self.kernel_size - 1) // 2 * dilation,
                          use_bias=self.use_bias,
                          use_weight_norm=self.use_weight_norm,
                          kernel_init=self.kernel_init,
                          dtype=self.compute_dtype, name=name)(x)
        return _PackedSameConv1d(self.channels, self.kernel_size,
                                 dilation=dilation, use_bias=self.use_bias,
                                 use_weight_norm=self.use_weight_norm,
                                 kernel_init=self.kernel_init,
                                 dtype=self.compute_dtype,
                                 time_pack=self.time_pack, name=name)(x)


class _PackedSameConv1d(nn.Module):
    """SAME conv on a time-packed (B, T/p, p*C) tensor; parameters are laid
    out exactly like Conv1d's so checkpoints are interchangeable."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: str = "torch_default"
    dtype: object = None  # compute dtype (params stay f32), as in Conv1d
    time_pack: int = 4

    @nn.compact
    def __call__(self, xp: Array) -> Array:
        from articulatory_tpu.layers.conv import (
            _resolve_kernel_init,
            _weight_norm_param,
            torch_bias_init,
        )
        from articulatory_tpu.ops.packed_conv import packed_conv1d, pack_kernel_jnp

        c_in = xp.shape[-1] // self.time_pack
        shape = (self.kernel_size, c_in, self.features)
        kinit = _resolve_kernel_init(self.kernel_init, (0, 1))
        if self.use_weight_norm:
            w = _weight_norm_param(self, shape, kinit, norm_axes=(0, 1))
        else:
            w = self.param("w", kinit, shape)
        b = None
        if self.use_bias:
            b = self.param("b", torch_bias_init(shape[0] * shape[1]),
                           (self.features,))
        from articulatory_tpu.layers.conv import _match_compute_dtype

        xp, w, b = _match_compute_dtype(xp, w, b, self.dtype)
        wp, lo, hi = pack_kernel_jnp(w, self.dilation, self.time_pack)
        return packed_conv1d(xp, wp, lo, hi, b, p=self.time_pack)


class WaveNetResidualBlock(nn.Module):
    """Gated tanh×sigmoid dilated conv with aux conditioning; returns (residual, skip)."""

    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    dropout: float = 0.0
    dilation: int = 1
    use_bias: bool = True
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array, c: Array | None, *, deterministic: bool = True
                 ) -> tuple[Array, Array]:
        residual = x
        if self.dropout > 0.0 and not deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        if self.use_causal_conv:
            pad = (self.kernel_size - 1) * self.dilation
            x = jnp.pad(x, [(0, 0), (pad, 0), (0, 0)])
            x = Conv1d(self.gate_channels, self.kernel_size, dilation=self.dilation,
                       use_bias=self.use_bias, use_weight_norm=self.use_weight_norm,
                       kernel_init="kaiming_normal_relu", bias_init="zeros",
                       name="conv")(x)
            x = x[:, : residual.shape[1], :]
        else:
            assert (self.kernel_size - 1) % 2 == 0, "Not support even kernel size."
            pad = (self.kernel_size - 1) // 2 * self.dilation
            x = Conv1d(self.gate_channels, self.kernel_size, dilation=self.dilation,
                       padding=pad, use_bias=self.use_bias,
                       use_weight_norm=self.use_weight_norm,
                       kernel_init="kaiming_normal_relu", bias_init="zeros",
                       name="conv")(x)

        # gated activation over channel halves
        xa, xb = jnp.split(x, 2, axis=-1)
        if c is not None:
            ca_cb = Conv1d(self.gate_channels, 1, use_bias=False,
                           use_weight_norm=self.use_weight_norm,
                           kernel_init="kaiming_normal_relu",
                           name="conv1x1_aux")(c)
            ca, cb = jnp.split(ca_cb, 2, axis=-1)
            xa, xb = xa + ca, xb + cb
        x = jnp.tanh(xa) * jax.nn.sigmoid(xb)

        s = Conv1d(self.skip_channels, 1, use_bias=self.use_bias,
                   use_weight_norm=self.use_weight_norm,
                   kernel_init="kaiming_normal_relu", bias_init="zeros",
                   name="conv1x1_skip")(x)
        out = Conv1d(self.residual_channels, 1, use_bias=self.use_bias,
                     use_weight_norm=self.use_weight_norm,
                     kernel_init="kaiming_normal_relu", bias_init="zeros",
                     name="conv1x1_out")(x)
        x = (out + residual) * math.sqrt(0.5)
        return x, s


class MelGANResidualStack(nn.Module):
    """Dilated conv + 1x1 skip stack (reference residual_stack.py:13-85)."""

    kernel_size: int = 3
    channels: int = 32
    dilation: int = 1
    use_bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    pad: str = "ReflectionPad1d"
    pad_params: dict = None
    use_causal_conv: bool = False
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.2})
        pad_mode = pad_layer_to_mode(self.pad)
        if not self.use_causal_conv:
            assert (self.kernel_size - 1) % 2 == 0, "Not support even kernel size."
            pad = (self.kernel_size - 1) // 2 * self.dilation
            y = Conv1d(self.channels, self.kernel_size, dilation=self.dilation,
                       padding=pad, use_bias=self.use_bias, pad_mode=pad_mode,
                       use_weight_norm=self.use_weight_norm, name="conv_dilated")(act(x))
        else:
            y = CausalConv1d(self.channels, self.kernel_size, dilation=self.dilation,
                             use_bias=self.use_bias,
                             use_weight_norm=self.use_weight_norm,
                             name="conv_dilated")(act(x))
        y = Conv1d(self.channels, 1, use_bias=self.use_bias,
                   use_weight_norm=self.use_weight_norm, name="conv_out")(act(y))
        skip = Conv1d(self.channels, 1, use_bias=self.use_bias,
                      use_weight_norm=self.use_weight_norm, name="conv_skip")(x)
        return y + skip


class ResBlock(nn.Module):
    """Conv-BatchNorm residual block (Gaddy & Klein transformer frontend)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        inp = x
        c_in = x.shape[-1]
        y = Conv1d(self.features, 3, padding=1, stride=self.stride, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = jax.nn.relu(y)
        y = Conv1d(self.features, 3, padding=1, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        if self.stride != 1 or c_in != self.features:
            res = Conv1d(self.features, 1, stride=self.stride, name="residual_path")(inp)
            res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name="res_norm")(res)
        else:
            res = inp
        return jax.nn.relu(y + res)


def _nearest_upsample(x: Array, scale: int) -> Array:
    """torch.nn.Upsample(scale_factor=s) nearest, over time axis of NLC."""
    if scale == 1:
        return x
    return jnp.repeat(x, scale, axis=1)


class GBlock(nn.Module):
    """GAN-TTS block with dilations (1, 3) + (9, 27) and upsampling."""

    output_dim: int
    upsample: int = 1
    kernel_size: int = 3
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # dilated SAME padding dilation*(k-1)//2 only preserves length for
        # odd k; even kernels break the residual add (in the reference too —
        # pytorch_layers.py:38 "Assumes kernel_size is odd i think"). Fail
        # loudly instead of with an opaque broadcast error.
        assert self.kernel_size % 2 == 1, \
            "GBlock requires an odd kernel_size (even kernels break the " \
            "residual length match)"
        pad = (self.kernel_size - 1) // 2
        # first residual pair
        y = jax.nn.relu(x)
        y = _nearest_upsample(y, self.upsample)
        y = Conv1d(self.output_dim, self.kernel_size, padding=pad,
                   use_weight_norm=self.use_weight_norm, name="conv1_a")(y)
        y = jax.nn.relu(y)
        y = Conv1d(self.output_dim, self.kernel_size, dilation=3, padding=3 * pad,
                   use_weight_norm=self.use_weight_norm, name="conv1_b")(y)
        res = _nearest_upsample(x, self.upsample)
        res = Conv1d(self.output_dim, 1, use_weight_norm=self.use_weight_norm,
                     name="res1")(res)
        x = y + res
        # second residual pair
        y = jax.nn.relu(x)
        y = Conv1d(self.output_dim, self.kernel_size, dilation=9, padding=9 * pad,
                   use_weight_norm=self.use_weight_norm, name="conv2_a")(y)
        y = jax.nn.relu(y)
        y = Conv1d(self.output_dim, self.kernel_size, dilation=27, padding=27 * pad,
                   use_weight_norm=self.use_weight_norm, name="conv2_b")(y)
        return x + y
