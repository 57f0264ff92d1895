"""StyleMelGAN TADE layers (reference: articulatory/layers/tade_res_block.py)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from articulatory_tpu.layers.conv import Conv1d

Array = jax.Array


def instance_norm_time(x: Array, eps: float = 1e-5) -> Array:
    """torch.nn.InstanceNorm1d (affine=False): normalize each (b, c) over time."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _upsample(x: Array, factor: int, mode: str) -> Array:
    if mode == "nearest":
        return upsample_nearest(x, factor)
    if mode == "linear":
        from articulatory_tpu.ops.interp import interpolate_linear

        return interpolate_linear(x, x.shape[1] * factor)
    raise ValueError(f"unsupported upsample_mode {mode!r} "
                     f"(supported: nearest, linear)")


def upsample_nearest(x: Array, factor: int) -> Array:
    if factor == 1:
        return x
    return jnp.repeat(x, factor, axis=1)


class TADELayer(nn.Module):
    """InstanceNorm + aux-conditioned affine modulation: y = cg1 * up(x) + cg2."""

    in_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 9
    use_bias: bool = True
    upsample_factor: int = 2
    upsample_mode: str = "nearest"

    @nn.compact
    def __call__(self, x: Array, c: Array) -> tuple[Array, Array]:
        x = instance_norm_time(x)
        c = _upsample(c, self.upsample_factor, self.upsample_mode)
        c = Conv1d(self.in_channels, self.kernel_size,
                   padding=(self.kernel_size - 1) // 2, use_bias=self.use_bias,
                   use_weight_norm=True, name="aux_conv")(c)
        cg = Conv1d(self.in_channels * 2, self.kernel_size,
                    padding=(self.kernel_size - 1) // 2, use_bias=self.use_bias,
                    use_weight_norm=True, name="gated_conv")(c)
        cg1, cg2 = jnp.split(cg, 2, axis=-1)
        y = cg1 * _upsample(x, self.upsample_factor, self.upsample_mode) + cg2
        return y, c


class TADEResBlock(nn.Module):
    """Two TADE layers with softmax/sigmoid-gated tanh activations + residual."""

    in_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 9
    dilation: int = 2
    use_bias: bool = True
    upsample_factor: int = 2
    upsample_mode: str = "nearest"
    gated_function: str = "softmax"

    @nn.compact
    def __call__(self, x: Array, c: Array) -> tuple[Array, Array]:
        def gate(z):
            if self.gated_function == "softmax":
                return jax.nn.softmax(z, axis=-1)  # over channels
            if self.gated_function == "sigmoid":
                return jax.nn.sigmoid(z)
            raise ValueError(f"{self.gated_function} is not supported.")

        residual = x
        x, c = TADELayer(self.in_channels, self.aux_channels, self.kernel_size,
                         self.use_bias, upsample_factor=1, name="tade1")(x, c)
        x = Conv1d(self.in_channels * 2, self.kernel_size,
                   padding=(self.kernel_size - 1) // 2, use_bias=self.use_bias,
                   use_weight_norm=True, name="gated_conv1")(x)
        xa, xb = jnp.split(x, 2, axis=-1)
        x = gate(xa) * jnp.tanh(xb)

        x, c = TADELayer(self.in_channels, self.in_channels, self.kernel_size,
                         self.use_bias, upsample_factor=self.upsample_factor,
                         name="tade2")(x, c)
        x = Conv1d(self.in_channels * 2, self.kernel_size, dilation=self.dilation,
                   padding=(self.kernel_size - 1) // 2 * self.dilation,
                   use_bias=self.use_bias, use_weight_norm=True,
                   name="gated_conv2")(x)
        xa, xb = jnp.split(x, 2, axis=-1)
        x = gate(xa) * jnp.tanh(xb)
        return _upsample(residual, self.upsample_factor,
                         self.upsample_mode) + x, c
