"""Pallas TPU kernel: fused MSD scale-discriminator head (layers 0-1).

The first two layers of the HiFi-GAN scale discriminator (reference
hifigan.py:595-640) dominate its cost at full rate: layer 0 is a k=15
C_in=1 conv over raw waveform, layer 1 a k=41 128->128 4-group conv at
stride 2. Even after the MXU lowering rewrites in ops/conv.py (tap-matmul
+ block-diagonal densification) XLA spends ~2.9 ms at the flagship shape
(32 x 8512) on what is ~0.6 ms of memory traffic + ~0.9 ms of MXU work.

This kernel fuses conv0 + LeakyReLU + conv1 + LeakyReLU in VMEM:

- The host pre-builds even/odd tap-window matrices ``cols_e/cols_o``
  (B, T/2, 128 — taps lane-padded 15 -> 128 for DMA alignment) with
  ``cols_e[b,t,s] = x[b, 2t+s-7]`` — a stride-2 polyphase split of the
  layer-0 im2col. All in-kernel slices are then unit-stride (TPU vectors
  cannot stride the sublane axis), and layer 0 becomes one
  (tile, 128) x (128, 128) MXU matmul per parity.
- Layer 1's 41 taps alternate parities: tap k reads rows
  ``t + (k - 20 + (k & 1)) // 2 - halo`` of the corresponding parity's
  layer-0 activation, already resident in VMEM — one (tile, 128) x
  (128, 128) matmul per tap against the block-diagonally densified
  grouped kernel.
- Matmul operands are cast to bf16 (f32 accumulation) — the same
  numerics contract as XLA's default-precision conv lowering on MXU, and
  a 3x pass saving over f32.

Outputs: layer-0 activations as the even/odd pair (h0_even, h0_odd) —
interleaving back to natural time order is left to the caller (the only
consumer, feature-matching L1, is permutation-invariant, so the model
concatenates instead) — and the layer-1 activation h1 in natural order.

Correctness is pinned against the XLA formulation in interpreter mode on
CPU (tests/test_pallas_scale_disc_head.py) and on the chip.

MEASURED RESULT (v5e, B=32 x T=8512, 30-iter pipelined sync): this kernel
runs at **4.03 ms vs 2.67 ms** for the XLA lowering with the ops/conv.py
MXU rewrites enabled — a quantified NEGATIVE. Why it loses: Mosaic manual
DMA requires 128-lane-aligned HBM slices, so the 15-tap window matrices
must be lane-padded 16 -> 128 (8x input traffic, ~290 MB/call at this
shape, plus an XLA-side materialization pass), and each grid program
serializes its halo DMA against compute (no double buffering), while
XLA's own schedule overlaps the h0 round trip it pays instead. The
theoretical floor (~1.4 ms: 0.93 ms MXU for the densified layer-1
contraction + cols traffic) leaves <1.3 ms of ceiling over XLA on a
~190 ms train step, so the kernel is kept as a tested artifact and the
XLA rewrites ship as the production path. The module stays exported for
the correctness tests and as the starting point should future shapes
(e.g. much larger batch) change the arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from articulatory_tpu.ops.conv import _grouped_to_dense, conv1d

K0 = 15
K1 = 41
PAD0 = (K0 - 1) // 2   # 7
PAD1 = (K1 - 1) // 2   # 20
HALO = 16              # parity-stream halo rows for layer 1 (>= 10, mult of 8)


def scale_disc_head_reference(x, w0, b0, wg, b1, *, negative_slope=0.1):
    """XLA reference: (act(conv0(x)), act(conv1(act(conv0(x)))))."""
    act = lambda v: jnp.where(v >= 0, v, negative_slope * v)  # noqa: E731
    h0 = act(conv1d(x, w0, b0, padding=PAD0))
    h1 = act(conv1d(h0, wg, b1, stride=2, padding=PAD1, groups=4))
    return h0, h1


def _kernel(ce_hbm, co_hbm, w0_ref, b0_ref, w1_ref, b1_ref,
            h0e_ref, h0o_ref, h1_ref, *, th: int, t_half: int,
            negative_slope: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ext = th + 2 * HALO

    def body(ce_v, co_v, sems):
        for src, dst, sem in ((ce_hbm, ce_v, sems.at[0]),
                              (co_hbm, co_v, sems.at[1])):
            cp = pltpu.make_async_copy(
                src.at[i, pl.ds(j * th, ext), :], dst, sem)
            cp.start()
            cp.wait()

        def l0(cols):
            h = jnp.dot(cols[...].astype(jnp.bfloat16),
                        w0_ref[...].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b0_ref[...]
            return jnp.where(h >= 0, h, negative_slope * h)

        h0e = l0(ce_v)   # (ext, 128) — layer-0 activation, even samples
        h0o = l0(co_v)
        # Halo rows outside [0, t_half) carry act(b0), not 0 (the zero pad
        # is on the INPUT, and bias+activation map it to act(b0)); layer 1's
        # conv zero-pads h0 itself, so mask them before the contraction.
        row = jax.lax.broadcasted_iota(jnp.int32, (ext, 1), 0) + j * th - HALO
        valid = (row >= 0) & (row < t_half)
        h0e = jnp.where(valid, h0e, 0.0)
        h0o = jnp.where(valid, h0o, 0.0)
        h0e_ref[0] = h0e[HALO:HALO + th, :]
        h0o_ref[0] = h0o[HALO:HALO + th, :]

        acc = jnp.zeros((th, 128), jnp.float32)
        for k in range(K1):
            # h0 sample index needed at output t is m = 2t + k - PAD1; its
            # parity stream is k & 1 (PAD1 even), at stream row
            # (m - (k & 1)) / 2 = t + (k - PAD1 - (k & 1)) // 2.
            src = h0o if (k & 1) else h0e
            off = HALO + (k - PAD1 - (k & 1)) // 2
            acc += jnp.dot(src[off:off + th, :].astype(jnp.bfloat16),
                           w1_ref[k].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        h1 = acc + b1_ref[...]
        h1_ref[0] = jnp.where(h1 >= 0, h1, negative_slope * h1)

    pl.run_scoped(
        body,
        pltpu.VMEM((th + 2 * HALO, 128), jnp.float32),
        pltpu.VMEM((th + 2 * HALO, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


def _parity_cols(x, parity: int, t_half_pad: int):
    """(B, T, 1) -> (B, HALO + t_half_pad + HALO, 128) tap windows of the
    given parity: cols[b, r, s] = x[b, 2*(r - HALO) + parity + s - PAD0]
    for s < K0, zero in the lane padding."""
    b, t, _ = x.shape
    lo = 2 * HALO - parity + PAD0
    hi = 2 * (t_half_pad + HALO) + parity - PAD0 + K0 - t
    xp = jnp.pad(x[..., 0], ((0, 0), (lo, max(hi, 0))))
    n = HALO + t_half_pad + HALO
    taps = [xp[:, s: s + 2 * (n - 1) + 1: 2] for s in range(K0)]
    cols = jnp.stack(taps, axis=-1)           # (B, n, 15)
    # Lane-pad 15 -> 128: Mosaic manual DMA slices must be 128-aligned on
    # the lane axis, so the tap matrix lives in HBM at full lane width (the
    # op stays compute-bound; see module docstring traffic arithmetic).
    return jnp.pad(cols, ((0, 0), (0, 0), (0, 128 - K0)))


@functools.partial(jax.jit, static_argnames=("negative_slope", "th",
                                             "interpret"))
def scale_disc_head_pallas(x, w0, b0, wg, b1, *, negative_slope: float = 0.1,
                           th: int = 544, interpret: bool = False):
    """Fused scale-disc head. x: (B, T, 1) with T even; w0: (15, 1, 128);
    wg: grouped (41, 32, 128); b: (128,).

    Returns (h0_even, h0_odd, h1): (B, T/2, 128) x3 — h0 split by sample
    parity (see module docstring), h1 in natural order.
    """
    b, t, cin = x.shape
    assert cin == 1 and t % 2 == 0, (x.shape,)
    t_half = t // 2
    nt = -(-t_half // th)
    t_half_pad = nt * th

    ce = _parity_cols(x, 0, t_half_pad)
    co = _parity_cols(x, 1, t_half_pad)
    w0p = jnp.pad(w0[:, 0, :], ((0, 128 - K0), (0, 0)))  # (128, 128)
    w1 = _grouped_to_dense(wg, 4)                        # (41, 128, 128)

    h0e, h0o, h1 = pl.pallas_call(
        functools.partial(_kernel, th=th, t_half=t_half,
                          negative_slope=negative_slope),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_half_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, t_half_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, t_half_pad, 128), jnp.float32),
        ),
        grid=(b, nt),
        in_specs=[
            # tap-window matrices stay in HBM; halo'd tiles are DMA'd
            # manually (overlap is not expressible with blocked index maps)
            pl.BlockSpec((b, t_half_pad + 2 * HALO, 128),
                         lambda i, j: (0, 0, 0), memory_space=pl.ANY),
            pl.BlockSpec((b, t_half_pad + 2 * HALO, 128),
                         lambda i, j: (0, 0, 0), memory_space=pl.ANY),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, 128, 128), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, th, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ce, co, w0p, b0, w1, b1)
    return (h0e[:, :t_half], h0o[:, :t_half], h1[:, :t_half])
