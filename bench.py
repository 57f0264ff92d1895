#!/usr/bin/env python3
"""Benchmark: E2W HiFi-GAN (CAR) synthesis throughput on one TPU chip.

Measures wav samples/sec/chip for the flagship EMA-to-waveform config
(conf/e2w_hifigan.yaml shapes: 141 input channels incl. 128 AR features,
channels 512, 80x upsample, chunked-AR decode with 8000-sample chunks).
The AR recurrence is a host-driven loop over a per-chunk jitted forward
(lax.scan over the generator compiles pathologically slowly on the remote
TPU — see CLAUDE.md); multiple utterances are batched per chunk to fill
the chip, and chunks stay device-resident with one scalar sync at the end.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples_per_sec_per_chip",
   "vs_baseline": N}
Baseline = 50x realtime at 16 kHz = 800_000 samples/sec/chip (BASELINE.md).
Round-2 measured: 32.5M samples/s/chip f32 (time packing on, batch 112).
Round-3 default: hybrid precision (f32 AR feedback path around a bf16
interior) — 36.2M samples/s/chip measured at the same knee (+11%), with
trained-weights decode quality certified in docs/DESIGN.md §7: its
ground-truth MCD is within 0.08 dB of the f32 decode's and its divergence
from f32 (3.25 dB) sits at 1.11x the f32 decode's OWN 1-ulp noise cone
(2.93 dB) — numerically indistinguishable from an f32 decode. `--f32`
reproduces the pure-f32 number.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 50 * 16000

# workload: batch of utterances, each N seconds of 200 Hz features.
# Batch sweep on v5e WITH the default time packing (samples/s):
#   16 -> 25.1M, 24 -> 26.5M, 32 -> 26.8M, 48 -> 28.4M, 64 -> 29.7M,
#   80 -> 31.1M, 96 -> 32.2M, 112 -> 32.6-32.9M, 120 -> 28.8M, 128 -> 29.3M
# (the pre-packing sweep peaked at 16: 8 -> 20.0M, 16 -> 20.6M, 32 -> 19.8M
# — packing moved the knee). The hybrid-precision sweep keeps the same
# knee: 96 -> 35.7M, 112 -> 36.2M, 128 -> 33.4M, 144 -> 31.6M. 112 is the
# measured optimum; offline batched synthesis is the headline workload,
# per-utterance latency is the streaming bench's metric
# (articulatory_tpu/streaming.py).
BATCH = 112
SECONDS_PER_UTT = 30.0
FRAME_RATE = 200
HOP = 80
CHUNK_FRAMES = 100   # batch_max_steps 8000 / hop 80
AR_INPUT = 512


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=BATCH,
                        help=f"utterances per AR chunk batch (default {BATCH}, "
                             "the measured sweep optimum)")
    parser.add_argument("--gen-bf16", action="store_true",
                        help="generator conv stack in bfloat16 (params f32; "
                             "numerics-changing — quality impact quantified "
                             "in docs/DESIGN.md before any default change)")
    parser.add_argument("--f32", action="store_true",
                        help="disable the default hybrid precision and run "
                             "the generator fully in f32 (round-2 headline "
                             "configuration: 32.5M samples/s/chip)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 weight quantization (per-out-channel "
                             "symmetric over folded kernels; dequantized "
                             "inside jit). Quality-gated by "
                             "tools/int8_quality_ab.sh.")
    parser.add_argument("--no-time-packing", action="store_true",
                        help="disable the exact-equivalence space-to-depth "
                             "packing of the narrow late stages (packing is "
                             "the default: 21.0M -> 25.4M samples/s/chip "
                             "measured; see docs/DESIGN.md §7)")
    args = parser.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from articulatory_tpu.models import HiFiGANGenerator

    if args.f32 and args.gen_bf16:
        parser.error("--f32 and --gen-bf16 are mutually exclusive")
    hybrid = not (args.f32 or args.gen_bf16)
    model = HiFiGANGenerator(
        in_channels=141, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        use_ar=True, ar_input=AR_INPUT, ar_hidden=256, ar_output=128,
        time_packing=None if args.no_time_packing else "auto",
        compute_dtype=(None if args.f32 else jnp.bfloat16),
        hybrid_precision=hybrid)

    n_frames = int(SECONDS_PER_UTT * FRAME_RATE)
    n_chunks = n_frames // CHUNK_FRAMES
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((n_chunks, args.batch, CHUNK_FRAMES, 13)), jnp.float32)

    c0 = feats[0]
    ar0 = jnp.zeros((args.batch, AR_INPUT, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), c0, ar=ar0)
    params = variables["params"]

    dequant = None
    if args.int8:
        from articulatory_tpu.utils.quantize import (
            dequantize_params,
            quantize_params_int8,
        )
        from articulatory_tpu.utils.weight_norm import fold_weight_norm

        params = jax.tree.map(jnp.asarray, quantize_params_int8(
            fold_weight_norm(jax.device_get(params))))
        dequant = dequantize_params

    # Per-chunk jitted forward; the AR recurrence is host-driven (matching
    # the production ar_loop), with the carried context keeping every chunk
    # data-dependent on the previous one. The final scalar fetch transitively
    # synchronizes the whole stream — block_until_ready is not a reliable
    # sync point on the axon relay platform.
    @jax.jit
    def chunk_fwd(params, cin, prev):
        if dequant is not None:
            params = dequant(params)
        out = model.apply({"params": params}, cin, ar=prev)
        return out, out[:, -AR_INPUT:, :]

    chunk_list = [feats[i] for i in range(n_chunks)]  # device-resident chunks

    def synthesize(params, chunks):
        prev = jnp.zeros((args.batch, AR_INPUT, 1), jnp.float32)
        total = 0
        for cin in chunks:
            out, prev = chunk_fwd(params, cin, prev)
            total += out.size
        return total, jnp.sum(out)

    # warmup / compile
    samples_per_iter, chk = synthesize(params, chunk_list)
    float(chk)

    n_iters = 3
    start = time.perf_counter()
    for i in range(n_iters):
        _, chk = synthesize(params, chunk_list)
        float(chk)  # host sync (depends on the iteration's full AR chain)
    elapsed = time.perf_counter() - start

    samples_per_sec = n_iters * samples_per_iter / elapsed
    per_chip = samples_per_sec  # single-chip benchmark by construction

    print(json.dumps({
        "metric": "e2w_hifigan_car_synthesis_throughput",
        "value": round(per_chip, 1),
        "unit": "samples_per_sec_per_chip",
        "vs_baseline": round(per_chip / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
