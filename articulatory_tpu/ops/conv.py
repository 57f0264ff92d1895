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

import os

import jax
import jax.numpy as jnp
from jax import lax

# MXU-aware lowering rewrites (exact numerics, measured on-chip in
# benchmarks/scale_disc_variants_bench.py):
#
# - C_in=1 convolutions (discriminator first layers over raw waveform —
#   reference hifigan.py:595-640, melgan.py, parallel_wavegan.py) cannot
#   fill the MXU's 128-wide contraction; XLA's conv lowering leaves ~20x
#   on the table. Rewritten as a tap-stacked (T, K) x (K, C_out) matmul.
# - Grouped convs whose per-group channel widths underfill MXU lanes
#   (e.g. the MSD's 128ch/4-group k=41 stack) are embedded as dense
#   block-diagonal kernels: nominal FLOPs grow by `groups`, but a <=128
#   contraction occupies the same MXU passes either way, so wall time
#   halves (4.87 -> 2.52 ms fwd, 9.52 -> 3.75 ms input grad at flagship
#   shape). Gated by a pass-count model so wide-channel grouped convs
#   (where densification genuinely costs passes) keep the native lowering.
#
# Toggle for A/B runs (ARTICULATORY_MXU_REWRITES=0 disables); tests pin
# equivalence with the plain lax lowering.
MXU_REWRITES = os.environ.get("ARTICULATORY_MXU_REWRITES", "1") != "0"


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _grouped_to_dense(w: jax.Array, groups: int) -> jax.Array:
    """(K, C_in//G, C_out) grouped kernel -> (K, C_in, C_out) block-diagonal.

    Group g (torch semantics: consecutive channel blocks) occupies input
    rows [g*cig, (g+1)*cig) and output cols [g*cog, (g+1)*cog); every
    off-block entry is zero, so the dense conv is numerically the grouped
    conv up to f32 summation order.
    """
    k, cig, c_out = w.shape
    cog = c_out // groups
    w4 = w.reshape(k, cig, groups, cog)
    eye = jnp.eye(groups, dtype=w.dtype)
    full = jnp.einsum("kcgo,gh->khcgo", w4, eye)
    return full.reshape(k, groups * cig, c_out)


def _dense_beats_grouped(c_in: int, c_out: int, groups: int) -> bool:
    """MXU pass-count model: does block-diagonal densification win?

    A matmul tile consumes ceil(K/128) x ceil(N/128) MXU passes regardless
    of how many lanes are actually populated; a grouped conv issues one
    such matmul per group.
    """
    cig, cog = c_in // groups, c_out // groups
    dense = _ceil_div(c_in, 128) * _ceil_div(c_out, 128)
    grouped = groups * _ceil_div(cig, 128) * _ceil_div(cog, 128)
    return dense < grouped


def _conv1d_tap_matmul(x, w, b, *, stride, pad, dilation, precision):
    """Narrow-C_in conv as a stacked-taps matmul.

    (B,T,C_in) -> windows (B,T_out,K,C_in) -> one (T_out, K*C_in) x
    (K*C_in, C_out) MXU contraction."""
    k, c_in, c_out = w.shape
    t = x.shape[1]
    lo, hi = pad
    t_out = (t + lo + hi - dilation * (k - 1) - 1) // stride + 1
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    cols = jnp.stack(
        [lax.slice_in_dim(xp, tap * dilation,
                          tap * dilation + stride * (t_out - 1) + 1,
                          stride=stride, axis=1)
         for tap in range(k)], axis=2)              # (B, T_out, K, C_in)
    y = jnp.einsum("btkc,kco->bto", cols, w, precision=precision)
    if b is not None:
        y = y + b
    return y


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
    if MXU_REWRITES and groups > 1 and _dense_beats_grouped(
            x.shape[-1], w.shape[-1], groups):
        w = _grouped_to_dense(w, groups)
        groups = 1
    t_out = (x.shape[1] + pad[0][0] + pad[0][1]
             - dilation * (w.shape[0] - 1) - 1) // stride + 1
    if (MXU_REWRITES and groups == 1 and 1 < w.shape[0] <= 64
            and x.shape[-1] <= 16 and x.shape[-1] * w.shape[0] <= 256
            and t_out >= 1):
        return _conv1d_tap_matmul(x, w, b, stride=stride, pad=pad[0],
                                  dilation=dilation, precision=precision)
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
    if (MXU_REWRITES and groups == 1 and w.shape[1] == 1 and w.shape[0] > 1
            and dilation == (1, 1) and stride[1] == 1 and pad[1] == (0, 0)
            and 1 < x.shape[2] <= 32 and x.shape[-1] <= 16):
        # (Kh, 1) kernels never mix the width axis, so the conv factorizes
        # into an independent height-conv per width column — the period
        # discriminators' entire stack has this shape (reference
        # hifigan.py:317-370). For NARROW inputs (C_in <= 16: the raw-
        # waveform first layer) the (B, H, W, C) layout is hostile on TPU:
        # W (2..11) pads to 8 sublanes and C to 128 lanes, inflating every
        # op's bytes ~16x. Fold width into channels — (B, H, W*C), lanes
        # full — and run a grouped conv1d (group w = width column w, torch
        # consecutive-block semantics match the w-major fold exactly) with
        # the kernel tiled per group; the grouped-conv densifier and the
        # narrow-C_in tap-matmul rewrites above then apply transitively.
        # Wide layers keep the native conv2d: their lanes are already full,
        # and the W-times-tiled grouped kernel this fold materializes grows
        # with W*C_in*C_out (115 MB at the 512->1024 period-11 layer) —
        # measured to explode compile time rather than help.
        bsz, h, wid, c_in = x.shape
        c_out = w.shape[-1]
        y = conv1d(x.reshape(bsz, h, wid * c_in),
                   jnp.tile(w[:, 0], (1, 1, wid)), None,
                   stride=stride[0], padding=pad[0], groups=wid,
                   precision=precision)
        y = y.reshape(bsz, y.shape[1], wid, c_out)
        return y + b if b is not None else y
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
