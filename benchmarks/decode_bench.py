#!/usr/bin/env python3
"""Decode benchmarks: single-stream CAR latency/RTF and batched throughput.

Run: python benchmarks/decode_bench.py [--streams 16] [--seconds 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=16)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--int8", action="store_true",
                   help="int8 weight quantization (LoadedModel.quantize_int8)")
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from articulatory_tpu.inference import ar_loop, ar_loop_batched, ar_loop_scan
    from articulatory_tpu.models import HiFiGANGenerator

    hop, sr = 80, 16000
    config = {"dataset_mode": "a2w", "batch_max_steps": 8000, "hop_size": hop,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 512}}
    model = HiFiGANGenerator(
        in_channels=141, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        use_ar=True, ar_input=512, ar_hidden=256, ar_output=128)

    class Shim:
        def __init__(self, model, params):
            self.model = model
            self.params = jax.device_put(params)
            self.mutables = {}

        @functools.cached_property
        def _jit(self):
            return jax.jit(
                lambda p, c, ar: self.model.apply({"params": p}, c, ar=ar))

        def __call__(self, c, ar=None):
            return self._jit(self.params, c, ar)

    c0 = jnp.zeros((1, 100, 13))
    v = model.init(jax.random.PRNGKey(0), c0,
                   ar=jnp.zeros((1, 512, 1), jnp.float32))
    if args.int8:
        from articulatory_tpu.inference import LoadedModel

        shim = LoadedModel(model=model, params=jax.device_put(v["params"]),
                           config=config, mutables={})
        shim.quantize_int8()
    else:
        shim = Shim(model, v["params"])

    rng = np.random.default_rng(0)
    n_frames = int(args.seconds * sr / hop)
    x = rng.standard_normal((n_frames, 13)).astype(np.float32)

    # single stream (warm)
    y = ar_loop(shim, x, config)
    start = time.perf_counter()
    y = ar_loop(shim, x, config)
    el = time.perf_counter() - start
    rtf = el / args.seconds
    print(f"single-stream CAR decode: RTF {rtf:.3f} "
          f"({1 / rtf:.0f}x realtime) for a {args.seconds:.0f}s utterance")

    # single stream, compiled scan (one dispatch for the whole utterance)
    y_scan = ar_loop_scan(shim, x, config)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y),
                               rtol=1e-4, atol=1e-4)
    start = time.perf_counter()
    y_scan = ar_loop_scan(shim, x, config)
    el = time.perf_counter() - start
    rtf = el / args.seconds
    print(f"single-stream CAR decode (--ar-scan): RTF {rtf:.4f} "
          f"({1 / rtf:.0f}x realtime) for a {args.seconds:.0f}s utterance")

    # batched streams
    xs = [rng.standard_normal((n_frames, 13)).astype(np.float32)
          for _ in range(args.streams)]
    _ = ar_loop_batched(shim, xs, config)
    start = time.perf_counter()
    _ = ar_loop_batched(shim, xs, config)
    el = time.perf_counter() - start
    total = args.streams * args.seconds
    print(f"batched CAR decode ({args.streams} streams): "
          f"{total / el:.0f}x realtime aggregate")


if __name__ == "__main__":
    main()
