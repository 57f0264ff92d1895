"""Feature upsampling networks for the ParallelWaveGAN aux path.

Parity targets: ``Stretch2d`` / ``UpsampleNetwork`` / ``ConvInUpsampleNetwork``
(reference: articulatory/layers/upsample.py:16-194). The Conv2d smoothing
filters use the reference's deterministic 1/prod(kernel) init.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.layers.activations import get_activation
from articulatory_tpu.layers.conv import Conv1d
from articulatory_tpu.ops.conv import conv2d

Array = jax.Array


def stretch_time(x: Array, scale: int) -> Array:
    """Nearest-neighbor stretch along time of NLC input."""
    if scale == 1:
        return x
    return jnp.repeat(x, scale, axis=1)


class UpsampleNetwork(nn.Module):
    """Per-scale: nearest-stretch in time then a (freq_k, 2*scale+1) smoothing conv.

    Operates on (B, T, C); the smoothing conv treats (T, C) as a 2-D image
    with a single channel, matching the reference's unsqueeze(1) Conv2d.
    """

    upsample_scales: Sequence[int]
    nonlinear_activation: str | None = None
    nonlinear_activation_params: dict = None
    interpolate_mode: str = "nearest"
    freq_axis_kernel_size: int = 1
    use_causal_conv: bool = False

    @nn.compact
    def __call__(self, c: Array) -> Array:
        assert (self.freq_axis_kernel_size - 1) % 2 == 0
        freq_pad = (self.freq_axis_kernel_size - 1) // 2
        for i, scale in enumerate(self.upsample_scales):
            # honor the config's interpolate_mode (reference Stretch2d
            # passes it to F.interpolate) instead of silently ignoring it
            if self.interpolate_mode == "nearest":
                c = stretch_time(c, scale)
            elif self.interpolate_mode == "linear":
                from articulatory_tpu.ops.interp import interpolate_linear

                c = interpolate_linear(c, c.shape[1] * scale)
            else:
                raise ValueError(
                    f"unsupported interpolate_mode {self.interpolate_mode!r} "
                    f"(supported: nearest, linear)")
            kernel = (self.freq_axis_kernel_size, scale * 2 + 1)

            def det_init(key, shape, _k=kernel):
                return jnp.full(shape, 1.0 / np.prod(_k), jnp.float32)

            # kernel layout (Kf, Kt, 1, 1); image layout (B, C_freq, T, 1)
            w = self.param(f"conv_{i}_w", det_init, kernel + (1, 1))
            img = c.transpose(0, 2, 1)[..., None]  # (B, C, T, 1) -> freq x time image
            if self.use_causal_conv:
                t_pad = (scale * 2, scale * 2)
            else:
                t_pad = (scale, scale)
            img = conv2d(img, w, padding=((freq_pad, freq_pad), t_pad))
            if self.use_causal_conv:
                img = img[:, :, : c.shape[1], :]
            c = img[..., 0].transpose(0, 2, 1)
            if self.nonlinear_activation is not None:
                act = get_activation(self.nonlinear_activation,
                                     self.nonlinear_activation_params or {})
                c = act(c)
        return c


class ConvInUpsampleNetwork(nn.Module):
    """Context Conv1d (no padding) + UpsampleNetwork for PWG aux features."""

    upsample_scales: Sequence[int]
    nonlinear_activation: str | None = None
    nonlinear_activation_params: dict = None
    interpolate_mode: str = "nearest"
    freq_axis_kernel_size: int = 1
    aux_channels: int = 80
    aux_context_window: int = 0
    use_causal_conv: bool = False
    use_weight_norm: bool = False

    @nn.compact
    def __call__(self, c: Array) -> Array:
        causal = self.use_causal_conv and self.aux_context_window > 0
        kernel_size = (self.aux_context_window + 1 if self.use_causal_conv
                       else 2 * self.aux_context_window + 1)
        c_ = Conv1d(self.aux_channels, kernel_size, use_bias=False,
                    use_weight_norm=self.use_weight_norm,
                    kernel_init="kaiming_normal_relu", name="conv_in")(c)
        c = c_[:, : -self.aux_context_window, :] if causal else c_
        return UpsampleNetwork(
            upsample_scales=self.upsample_scales,
            nonlinear_activation=self.nonlinear_activation,
            nonlinear_activation_params=self.nonlinear_activation_params,
            interpolate_mode=self.interpolate_mode,
            freq_axis_kernel_size=self.freq_axis_kernel_size,
            use_causal_conv=self.use_causal_conv,
            name="upsample")(c)
