#!/usr/bin/env python3
"""A/B the MSD scale-discriminator layer-0/1 formulations on the chip.

Per-layer timing (benchmarks/disc_layers_bench.py) shows the first scale
discriminator spends most of its time in layer 0 (k=15, C_in=1) and
layer 1 (k=41, 128->128, groups=4, stride 2) — both structurally hostile
to XLA's default conv lowering: C_in=1 cannot fill the MXU's contraction
lanes, and a 4-group conv with 32-wide groups uses 1/4 of the output
lanes. Two exact-numerics reformulations are measured against the
baseline (reference shapes: hifigan.py:595-640):

- layer 0 as im2col matmul: stack the 15 taps into an input channel axis
  (tiny: the waveform is B x T x 1) and contract — one (T, 15) x (15, 128)
  MXU matmul instead of a degenerate conv.
- layer 1 as block-diagonal dense conv: embed the grouped kernel in a
  (41, 128, 128) kernel with zeros off-block. 4x the nominal FLOPs, but a
  128-wide contraction occupies the same MXU passes a 32-wide one does, so
  if XLA lowers grouped convs by group-partitioning this is a straight win.

Run: python benchmarks/scale_disc_variants_bench.py [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, iters=20):
    """Pipelined timing: queue all dispatches, one readback sync."""
    import jax.numpy as jnp

    float(jnp.sum(fn(*args)))
    start = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1]))
    return (time.perf_counter() - start) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=8512)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from articulatory_tpu.ops.conv import conv1d

    B, T = args.batch, args.steps
    K0, C, K1, G = 15, 128, 41, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, 1)) * 0.1, jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((K0, 1, C)) * 0.05, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((C,)) * 0.01, jnp.float32)
    wg = jnp.asarray(rng.standard_normal((K1, C // G, C)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((C,)) * 0.01, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, T, C)) * 0.1, jnp.float32)

    act = lambda v: jnp.where(v >= 0, v, 0.1 * v)  # noqa: E731

    def block_diag_kernel(wg):
        """(K, C//G, C) grouped -> (K, C, C) dense with zeros off-block."""
        cg = C // G
        full = jnp.zeros((K1, C, C), wg.dtype)
        for g in range(G):
            full = full.at[:, g * cg:(g + 1) * cg, g * cg:(g + 1) * cg].set(
                wg[:, :, g * cg:(g + 1) * cg])
        return full

    def im2col_cols(x):
        """(B, T, 1) -> (B, T, K0) sliding windows, SAME (pad 7)."""
        xp = jnp.pad(x[..., 0], ((0, 0), (K0 // 2, K0 // 2)))
        return jnp.stack([xp[:, k:k + T] for k in range(K0)], axis=-1)

    variants = {
        "l0_conv": jax.jit(lambda x: conv1d(x, w0, b0, padding=K0 // 2)),
        "l0_im2col": jax.jit(
            lambda x: jnp.einsum("btk,kc->btc", im2col_cols(x), w0[:, 0, :]) + b0),
        "l1_grouped": jax.jit(
            lambda h: conv1d(h, wg, b1, stride=2, padding=K1 // 2, groups=G)),
        "l1_blockdiag": jax.jit(
            lambda h: conv1d(h, block_diag_kernel(wg), b1, stride=2,
                             padding=K1 // 2)),
        "fused01_baseline": jax.jit(
            lambda x: act(conv1d(act(conv1d(x, w0, b0, padding=K0 // 2)),
                                 wg, b1, stride=2, padding=K1 // 2, groups=G))),
        "fused01_matmul": jax.jit(
            lambda x: act(conv1d(
                act(jnp.einsum("btk,kc->btc", im2col_cols(x), w0[:, 0, :]) + b0),
                block_diag_kernel(wg), b1, stride=2, padding=K1 // 2))),
    }

    # numerics check (CPU-cheap, on device): reformulations must be exact-ish
    ref0 = variants["l0_conv"](x)
    alt0 = variants["l0_im2col"](x)
    ref1 = variants["l1_grouped"](h)
    alt1 = variants["l1_blockdiag"](h)
    print(json.dumps({
        "l0_maxerr": float(jnp.max(jnp.abs(ref0 - alt0))),
        "l1_maxerr": float(jnp.max(jnp.abs(ref1 - alt1))),
    }), flush=True)

    for name, fn in variants.items():
        arg = h if name.startswith("l1") else x
        t = _time(fn, (arg,), args.iters)
        print(json.dumps({name: {"ms": round(t * 1e3, 3)}}), flush=True)

    # gradient-side comparison: d/dh and d/dw through each layer-1 form
    for name, fn in (("l1_grouped", variants["l1_grouped"]),
                     ("l1_blockdiag", variants["l1_blockdiag"])):
        g = jax.jit(jax.grad(lambda h: jnp.sum(fn(h) ** 2)))
        t = _time(g, (h,), args.iters)
        print(json.dumps({f"{name}_grad_h": {"ms": round(t * 1e3, 3)}}),
              flush=True)
    for name, make in (("l1_grouped",
                        lambda w: conv1d(h, w, b1, stride=2, padding=K1 // 2,
                                         groups=G)),
                       ("l1_blockdiag",
                        lambda w: conv1d(h, block_diag_kernel(w), b1, stride=2,
                                         padding=K1 // 2))):
        g = jax.jit(jax.grad(lambda w: jnp.sum(make(w) ** 2)))
        t = _time(g, (wg,), args.iters)
        print(json.dumps({f"{name}_grad_w": {"ms": round(t * 1e3, 3)}}),
              flush=True)


if __name__ == "__main__":
    main()
