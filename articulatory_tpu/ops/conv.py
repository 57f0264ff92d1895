"""1-D convolution primitives with exact PyTorch semantics, NLC layout.

The reference framework leans entirely on ``torch.nn.Conv1d`` /
``torch.nn.ConvTranspose1d`` (reference: articulatory/models/hifigan.py:107-131,
articulatory/layers/residual_block.py). To be able to ingest reference
checkpoints and hit MCD parity, these ops reproduce PyTorch's output-length
and padding semantics bit-for-bit, while using the TPU-friendly NLC
(batch, time, channels) layout so the channel dimension maps onto lanes.

Kernel layout convention used throughout this framework:

- ``conv1d`` weight: ``(K, C_in, C_out)`` (jax "HIO").
- ``conv_transpose1d`` weight: ``(K, C_in, C_out)`` where the kernel has
  already been time-flipped relative to PyTorch's ``(C_in, C_out, K)``
  layout; the converter in ``utils/torch_import.py`` handles the mapping
  ``w_jax[k, i, o] = w_torch[i, o, K-1-k]``.

XLA lowers both to MXU matmuls; grouped convs use ``feature_group_count``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def conv1d_output_length(length: int, kernel_size: int, stride: int = 1,
                         padding: int = 0, dilation: int = 1) -> int:
    """PyTorch Conv1d output length."""
    return (length + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1


def conv_transpose1d_output_length(length: int, kernel_size: int, stride: int = 1,
                                   padding: int = 0, output_padding: int = 0,
                                   dilation: int = 1) -> int:
    """PyTorch ConvTranspose1d output length."""
    return (length - 1) * stride - 2 * padding + dilation * (kernel_size - 1) + 1 + output_padding


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
           stride: int = 1, padding: int | tuple[int, int] = 0, dilation: int = 1,
           groups: int = 1, precision=None) -> jax.Array:
    """1-D convolution over NLC input.

    Args:
        x: input ``(B, T, C_in)``.
        w: kernel ``(K, C_in // groups, C_out)``.
        b: optional bias ``(C_out,)``.
        padding: symmetric int or explicit ``(lo, hi)`` pair.

    Returns:
        ``(B, T_out, C_out)``.
    """
    if isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        pad = [tuple(padding)]
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
                     stride: int = 1, padding: int = 0, output_padding: int = 0,
                     dilation: int = 1, precision=None) -> jax.Array:
    """1-D transposed convolution matching ``torch.nn.ConvTranspose1d``.

    Implemented as an input-dilated (fractionally-strided) regular
    convolution, which XLA maps onto the MXU directly:

        pad_lo = dilation*(K-1) - padding
        pad_hi = dilation*(K-1) - padding + output_padding

    Args:
        x: input ``(B, T, C_in)``.
        w: time-flipped kernel ``(K, C_in, C_out)`` (see module docstring).
        b: optional bias ``(C_out,)``.

    Returns:
        ``(B, (T-1)*stride - 2*padding + dilation*(K-1) + 1 + output_padding, C_out)``.
    """
    k = w.shape[0]
    pad_lo = dilation * (k - 1) - padding
    pad_hi = dilation * (k - 1) - padding + output_padding
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *,
           stride: tuple[int, int] = (1, 1),
           padding: tuple[int, int] | tuple[tuple[int, int], tuple[int, int]] = (0, 0),
           dilation: tuple[int, int] = (1, 1), groups: int = 1,
           precision=None) -> jax.Array:
    """2-D convolution over NHWC input with kernel ``(Kh, Kw, C_in//groups, C_out)``.

    Used by the period discriminators (reference: hifigan.py:317-448) and
    the PWG upsample network's Conv2d stages.
    """
    if isinstance(padding[0], int):
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        pad = [tuple(padding[0]), tuple(padding[1])]
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    return jnp.where(x >= 0, x, x * negative_slope)
