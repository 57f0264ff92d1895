#!/usr/bin/env python3
"""MRI2W HiFi-CAR synthesis benchmark: 20 kHz, 240x upsample, 358-ch input.

The second flagship workload (reference egs/mri/voc1/conf/
mri2w_hifigan_car.yaml:13-41): hop 240, upsample scales [8, 5, 3, 2],
channels 512, chunked-CAR decode with 30000-sample chunks (125 frames).
Mirrors bench.py's method: host-driven AR recurrence over a per-chunk jitted
forward, utterances batched per chunk, device-resident chunks, one scalar
readback at the end (the only real sync point on the axon relay platform).

Baseline equivalent: 50x realtime at 20 kHz = 1_000_000 samples/s/chip.

Run: python benchmarks/mri_bench.py [--batch 16] [--seconds 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

SR = 20000
HOP = 240
FRAME_RATE = SR // HOP  # 83.33 -> use frames directly
CHUNK_FRAMES = 125      # batch_max_steps 30000 / hop 240
AR_INPUT = 512
IN_FEATS = 358 - 128    # raw articulatory channels (128 AR features concat)
BASELINE_SAMPLES_PER_SEC = 50 * SR


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--no-time-packing", action="store_true")
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from articulatory_tpu.models import HiFiGANGenerator

    model = HiFiGANGenerator(
        in_channels=IN_FEATS + 128, out_channels=1, channels=512,
        kernel_size=7, upsample_scales=(8, 5, 3, 2),
        upsample_kernel_sizes=(16, 10, 6, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        use_ar=True, ar_input=AR_INPUT, ar_hidden=256, ar_output=128,
        time_packing=None if args.no_time_packing else "auto")

    n_frames = int(args.seconds * SR) // HOP
    n_chunks = n_frames // CHUNK_FRAMES
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (n_chunks, args.batch, CHUNK_FRAMES, IN_FEATS)), jnp.float32)

    ar0 = jnp.zeros((args.batch, AR_INPUT, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats[0], ar=ar0)["params"]

    @jax.jit
    def chunk_fwd(params, cin, prev):
        out = model.apply({"params": params}, cin, ar=prev)
        return out, out[:, -AR_INPUT:, :]

    chunk_list = [feats[i] for i in range(n_chunks)]

    def synthesize(params, chunks):
        prev = jnp.zeros((args.batch, AR_INPUT, 1), jnp.float32)
        total = 0
        for cin in chunks:
            out, prev = chunk_fwd(params, cin, prev)
            total += out.size
        return total, jnp.sum(out)

    samples_per_iter, chk = synthesize(params, chunk_list)
    float(chk)  # warmup + compile; host readback = sync

    start = time.perf_counter()
    for _ in range(args.iters):
        _, chk = synthesize(params, chunk_list)
        float(chk)
    elapsed = time.perf_counter() - start

    per_chip = args.iters * samples_per_iter / elapsed
    print(json.dumps({
        "metric": "mri2w_hifigan_car_synthesis_throughput",
        "value": round(per_chip, 1),
        "unit": "samples_per_sec_per_chip",
        "vs_baseline": round(per_chip / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
