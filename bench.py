#!/usr/bin/env python3
"""Benchmark: E2W HiFi-GAN (CAR) synthesis throughput on one TPU chip.

Measures wav samples/sec/chip for the flagship EMA-to-waveform config
(conf/e2w_hifigan.yaml shapes: 141 input channels incl. 128 AR features,
channels 512, 80x upsample, chunked-AR decode with 8000-sample chunks).
The AR recurrence runs as a compiled lax.scan; multiple utterances are
batched through the scan to fill the chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples_per_sec_per_chip",
   "vs_baseline": N}
Baseline = 50x realtime at 16 kHz = 800_000 samples/sec/chip (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 50 * 16000

# workload: batch of utterances, each N seconds of 200 Hz features
BATCH = 8
SECONDS_PER_UTT = 10.0
FRAME_RATE = 200
HOP = 80
CHUNK_FRAMES = 100   # batch_max_steps 8000 / hop 80
AR_INPUT = 512


def main():
    import jax
    import jax.numpy as jnp

    from articulatory_tpu.models import HiFiGANGenerator

    model = HiFiGANGenerator(
        in_channels=141, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        use_ar=True, ar_input=AR_INPUT, ar_hidden=256, ar_output=128)

    n_frames = int(SECONDS_PER_UTT * FRAME_RATE)
    n_chunks = n_frames // CHUNK_FRAMES
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((n_chunks, BATCH, CHUNK_FRAMES, 13)), jnp.float32)

    c0 = feats[0]
    ar0 = jnp.zeros((BATCH, AR_INPUT, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), c0, ar=ar0)
    params = variables["params"]

    @jax.jit
    def synthesize(params, chunks):
        def body(prev, cin):
            out = model.apply({"params": params}, cin, ar=prev)
            return out[:, -AR_INPUT:, :], out

        prev0 = jnp.zeros((chunks.shape[1], AR_INPUT, 1), jnp.float32)
        _, outs = jax.lax.scan(body, prev0, chunks)
        # (n_chunks, B, chunk_samples, 1) -> (B, T, 1)
        return jnp.swapaxes(outs, 0, 1).reshape(chunks.shape[1], -1)

    # warmup / compile
    wav = synthesize(params, feats)
    jax.block_until_ready(wav)

    n_iters = 3
    start = time.perf_counter()
    for _ in range(n_iters):
        wav = synthesize(params, feats)
    jax.block_until_ready(wav)
    elapsed = time.perf_counter() - start

    total_samples = n_iters * wav.size
    samples_per_sec = total_samples / elapsed
    n_chips = max(1, len([d for d in jax.devices()]))
    per_chip = samples_per_sec / 1  # single-chip benchmark by construction

    print(json.dumps({
        "metric": "e2w_hifigan_car_synthesis_throughput",
        "value": round(per_chip, 1),
        "unit": "samples_per_sec_per_chip",
        "vs_baseline": round(per_chip / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
