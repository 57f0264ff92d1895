"""Pallas TPU kernel: fused HiFi-GAN residual pair.

Computes ``y = x + conv2(act(conv1(act(x))))`` — one dilation branch of the
MRF residual block (reference articulatory/layers/residual_block.py:207-222)
— in a single VMEM-resident kernel. At the generator's last stages the
feature maps are long and narrow ((B, 8000, 32) fp32), so the six separate
conv ops XLA emits are HBM-bandwidth-bound; fusing both convs and both
LeakyReLUs keeps the intermediate activations on-chip and cuts HBM traffic
~3x for the branch.

Because the time tiles need halo overlap (not expressible with blocked
index maps), the input stays in HBM and each grid cell DMAs its
``t_tile + 2*halo`` window into VMEM scratch explicitly. Each conv is a sum
over kernel taps of an (T_tile, C) x (C, C) matmul — MXU work. Weights are
the *effective* (post-weight-norm) kernels; fold them before calling.

A pure-XLA fallback with identical semantics (`resblock_pair_reference`)
serves CPU/debugging; correctness is tested in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from articulatory_tpu.ops.conv import conv1d


def resblock_pair_reference(x, w1, b1, w2, b2, *, dilation: int,
                            negative_slope: float = 0.1):
    """XLA reference: x + conv2(act(conv1(act(x)))), SAME padding, k from w."""
    k = w1.shape[0]
    act = lambda v: jnp.where(v >= 0, v, negative_slope * v)  # noqa: E731
    h = conv1d(act(x), w1, b1, padding=(k - 1) // 2 * dilation,
               dilation=dilation)
    y = conv1d(act(h), w2, b2, padding=(w2.shape[0] - 1) // 2)
    return x + y


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            t_tile: int, halo1: int, halo2: int, k: int, k2: int,
            dilation: int, negative_slope: float, seq_len: int):
    """Grid cell (batch b, time-tile j): DMA the halo'd window, compute, store."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    pad = halo1 + halo2
    c = o_ref.shape[-1]
    win = t_tile + 2 * pad

    def body(x_vmem, sem):
        # x_hbm is the full zero-padded input (B, T + 2*pad, C) kept in HBM
        # (ANY-space blocks must be whole-array); tile (i, j) covers batch i,
        # padded-input range [j*t_tile, j*t_tile + win)
        cp = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * t_tile, win), :], x_vmem, sem)
        cp.start()
        cp.wait()

        x = x_vmem[...]  # (win, C)
        a1 = jnp.where(x >= 0, x, negative_slope * x)

        mid_len = t_tile + 2 * halo2
        acc1 = jnp.zeros((mid_len, c), jnp.float32)
        for tap in range(k):
            off = tap * dilation
            acc1 += jnp.dot(a1[off: off + mid_len, :], w1_ref[tap],
                            preferred_element_type=jnp.float32)
        h = acc1 + b1_ref[...]
        a2 = jnp.where(h >= 0, h, negative_slope * h)
        # SAME-padding parity: the unfused conv2 sees zeros outside the valid
        # sequence, not h computed from conv1's zero padding — mask the halo
        # rows that fall outside [0, seq_len)
        gpos = (j * t_tile - halo2
                + jax.lax.broadcasted_iota(jnp.int32, (mid_len, c), 0))
        a2 = jnp.where((gpos >= 0) & (gpos < seq_len), a2, 0.0)

        acc2 = jnp.zeros((t_tile, c), jnp.float32)
        for tap in range(k2):
            acc2 += jnp.dot(a2[tap: tap + t_tile, :], w2_ref[tap],
                            preferred_element_type=jnp.float32)
        y = acc2 + b2_ref[...]

        o_ref[0] = x[pad: pad + t_tile, :] + y

    pl.run_scoped(
        body,
        pltpu.VMEM((win, c), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("dilation", "negative_slope",
                                             "t_tile", "interpret"))
def resblock_pair_pallas(x, w1, b1, w2, b2, *, dilation: int,
                         negative_slope: float = 0.1, t_tile: int = 2000,
                         interpret: bool = False):
    """Fused residual pair. x: (B, T, C); w: (K, C, C); b: (C,).

    T must be divisible by t_tile (callers pad)."""
    b, t, c_orig = x.shape
    k = w1.shape[0]
    k2 = w2.shape[0]
    assert t % t_tile == 0, (t, t_tile)
    halo1 = (k - 1) // 2 * dilation
    halo2 = (k2 - 1) // 2
    pad = halo1 + halo2

    # Mosaic DMA slices must be lane-aligned: pad channels to a multiple of
    # 128. Zero-padded input channels contribute nothing; padded output
    # channels are sliced off. MXU cost is unchanged (a <=128-wide matmul
    # occupies one pass either way).
    c = -(-c_orig // 128) * 128
    if c != c_orig:
        cpad = c - c_orig
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cpad)))
        w1 = jnp.pad(w1, ((0, 0), (0, cpad), (0, cpad)))
        w2 = jnp.pad(w2, ((0, 0), (0, cpad), (0, cpad)))
        b1 = jnp.pad(b1, (0, cpad))
        b2 = jnp.pad(b2, (0, cpad))

    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    n_t = t // t_tile

    out = pl.pallas_call(
        functools.partial(_kernel, t_tile=t_tile, halo1=halo1, halo2=halo2,
                          k=k, k2=k2, dilation=dilation,
                          negative_slope=negative_slope, seq_len=t),
        out_shape=jax.ShapeDtypeStruct((b, t, c), jnp.float32),
        grid=(b, n_t),
        in_specs=[
            # stays in HBM; windows are DMA'd manually (halo overlap)
            pl.BlockSpec((b, t + 2 * pad, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((k, c, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, c, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w1, b1, w2, b2)
    return out[..., :c_orig]
