"""Space-to-depth packed 1-D convolution for narrow-channel stages.

The HiFi-GAN generator's late stages run convs at 32-64 channels over very
long time axes; on TPU the channel (lane) dimension is 128-wide, so those
matmuls use 1/16-1/4 of the MXU. Packing ``p`` consecutive timesteps into
channels turns a conv over (T, C) into an *exactly equivalent* conv over
(T/p, p*C) with a transformed dense kernel — full lane utilization and ~p
times fewer MXU passes when p*C <= 128.

Derivation: with SAME padding (odd K, center c = (K-1)//2),
    y[p*t' + i, co] = sum_{k,ci} w[k,ci,co] * x[p*t' + i + (k-c)*d, ci].
Writing i + (k-c)*d = p*q + r (0 <= r < p) maps every (i, k) pair to packed
tap q and packed input channel r*C+ci, giving a dense packed kernel
    W'[q - qmin, r*C + ci, i*C + co] = w[k, ci, co]
applied with dilation 1 and asymmetric padding (-qmin, qmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def pack_time(x: jax.Array, p: int) -> jax.Array:
    """(B, T, C) -> (B, T/p, p*C); T must be divisible by p."""
    b, t, c = x.shape
    assert t % p == 0, (t, p)
    return x.reshape(b, t // p, p * c)


def unpack_time(x: jax.Array, p: int) -> jax.Array:
    """(B, T', p*C) -> (B, T'*p, C)."""
    b, tp, pc = x.shape
    return x.reshape(b, tp * p, pc // p)


def pack_kernel(w: np.ndarray, dilation: int, p: int
                ) -> tuple[np.ndarray, int, int]:
    """Transform (K, C, C_out) SAME-conv kernel into its packed equivalent.

    Returns (W' of shape (Q, p*C, p*C_out), pad_lo, pad_hi) for a dilation-1
    conv over the packed layout.
    """
    k, c_in, c_out = w.shape
    assert k % 2 == 1, "SAME packing requires odd kernels"
    center = (k - 1) // 2
    offsets = [(i, kk, i + (kk - center) * dilation)
               for i in range(p) for kk in range(k)]
    qs = [s // p for _, _, s in offsets]
    qmin, qmax = min(qs), max(qs)
    q_taps = qmax - qmin + 1
    wp = np.zeros((q_taps, p * c_in, p * c_out), w.dtype)
    for i, kk, s in offsets:
        q, r = s // p, s % p
        wp[q - qmin, r * c_in:(r + 1) * c_in, i * c_out:(i + 1) * c_out] += \
            np.asarray(w[kk])
    return wp, -qmin, qmax


def pack_kernel_jnp(w: jax.Array, dilation: int, p: int
                    ) -> tuple[jax.Array, int, int]:
    """Traced version of pack_kernel (w may be a jitted parameter)."""
    k, c_in, c_out = w.shape
    assert k % 2 == 1
    center = (k - 1) // 2
    offsets = [(i, kk, i + (kk - center) * dilation)
               for i in range(p) for kk in range(k)]
    qs = [s // p for _, _, s in offsets]
    qmin, qmax = min(qs), max(qs)
    wp = jnp.zeros((qmax - qmin + 1, p * c_in, p * c_out), w.dtype)
    for i, kk, s in offsets:
        q, r = s // p, s % p
        wp = wp.at[q - qmin, r * c_in:(r + 1) * c_in,
                   i * c_out:(i + 1) * c_out].add(w[kk])
    return wp, -qmin, qmax


def packed_conv1d(xp: jax.Array, wp: jax.Array, pad_lo: int, pad_hi: int,
                  b: jax.Array | None = None, p: int = 4) -> jax.Array:
    """Packed-layout conv: xp (B, T', p*C) with a pack_kernel result."""
    y = lax.conv_general_dilated(
        xp, wp, window_strides=(1,), padding=[(pad_lo, pad_hi)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    if b is not None:
        # bias per original channel, tiled across the packed phases
        y = y + jnp.tile(b, y.shape[-1] // b.shape[0])
    return y


def conv1d_packed_same(x: jax.Array, w: jax.Array, b: jax.Array | None, *,
                       dilation: int = 1, p: int = 4) -> jax.Array:
    """Drop-in SAME conv (odd K) computed through time packing.

    Exactly equals ops.conv.conv1d(x, w, b, padding=(K-1)//2*d, dilation=d)
    for T divisible by p (parity-tested)."""
    wp, lo, hi = pack_kernel(np.asarray(w), dilation, p)
    xp = pack_time(x, p)
    yp = packed_conv1d(xp, jnp.asarray(wp), lo, hi, b, p=p)
    return unpack_time(yp, p)
