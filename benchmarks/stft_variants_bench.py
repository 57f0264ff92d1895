#!/usr/bin/env python3
"""A/B the mel-loss STFT formulations, forward AND backward, pipelined sync.

Variants (flagship mel loss shapes: B x 8000 samples, fft 1024, hop 256):
  rfft          frame (conv patches) -> window -> jnp.fft.rfft
  frame_matmul  frame (conv patches) -> windowed-basis matmul (f32 HIGHEST)
  strided_conv  one strided conv with the windowed [cos|-sin] basis kernel

The backward matters as much as the forward: a strided conv's input
gradient is an lhs-dilated conv XLA may lower badly, while the matmul's
backward is another matmul plus the patches transpose (scatter-add).

Run: python benchmarks/stft_variants_bench.py [--batch 32]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--n-fft", type=int, default=1024)
    p.add_argument("--hop", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    from jax import lax

    from articulatory_tpu.ops.stft import _padded_window, frame_signal

    def _dft_matrices(n_fft):
        """Real-DFT basis (cos, sin): rfft(x) = x @ cos - 1j * (x @ sin).

        Lives here with the losing formulations it supports (ops/stft.py
        ships plain rfft after this benchmark's A/B)."""
        k = np.arange(n_fft, dtype=np.float64)[:, None]
        f = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * k * f / n_fft
        return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    n_fft, hop = args.n_fft, args.hop
    w = _padded_window("hann", n_fft, n_fft)
    cos_m, sin_m = _dft_matrices(n_fft)
    wc = jnp.asarray(cos_m * w[:, None])
    ws = jnp.asarray(sin_m * w[:, None])
    basis = jnp.concatenate([wc, -ws], axis=1)
    w_j = jnp.asarray(w)
    n_bins = n_fft // 2 + 1

    def _pad(x):
        pad = n_fft // 2
        return jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")

    def mag_rfft(x):
        z = jnp.fft.rfft(frame_signal(_pad(x), n_fft, hop) * w_j, axis=-1)
        return jnp.sqrt(jnp.clip(jnp.real(z) ** 2 + jnp.imag(z) ** 2,
                                 min=1e-7))

    def mag_frame_matmul(x):
        frames = frame_signal(_pad(x), n_fft, hop)
        re = jnp.matmul(frames, wc, precision=lax.Precision.HIGHEST)
        im = -jnp.matmul(frames, ws, precision=lax.Precision.HIGHEST)
        return jnp.sqrt(jnp.clip(re ** 2 + im ** 2, min=1e-7))

    def mag_strided_conv(x):
        z = lax.conv_general_dilated(
            _pad(x)[..., None], basis[:, None, :], window_strides=(hop,),
            padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"),
            precision=lax.Precision.HIGHEST)
        re, im = z[..., :n_bins], z[..., n_bins:]
        return jnp.sqrt(jnp.clip(re ** 2 + im ** 2, min=1e-7))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, args.steps)) * 0.1,
                    jnp.float32)
    y = jnp.asarray(rng.standard_normal((args.batch, args.steps)) * 0.1,
                    jnp.float32)

    def _time(fn, *fargs):
        float(jnp.sum(fn(*fargs)))
        start = time.perf_counter()
        outs = [fn(*fargs) for _ in range(args.iters)]
        float(jnp.sum(outs[-1]))
        return (time.perf_counter() - start) / args.iters * 1e3

    for name, mag in (("rfft", mag_rfft), ("frame_matmul", mag_frame_matmul),
                      ("strided_conv", mag_strided_conv)):
        fwd = jax.jit(lambda a, b, m=mag: jnp.mean(jnp.abs(m(a) - m(b))))
        bwd = jax.jit(jax.grad(lambda a, b, m=mag:
                               jnp.mean(jnp.abs(m(a) - m(b)))))
        t_f = _time(fwd, x, y)
        t_b = _time(bwd, x, y)
        print(json.dumps({name: {"fwd_ms": round(t_f, 3),
                                 "fwd_bwd_ms": round(t_b, 3)}}), flush=True)


if __name__ == "__main__":
    main()
