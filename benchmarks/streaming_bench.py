#!/usr/bin/env python3
"""Streaming-serving latency benchmark: per-chunk latency of the
StreamingSynthesizer at 1..N concurrent streams.

Run: python benchmarks/streaming_bench.py [--max-streams 16] [--chunks 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-streams", type=int, default=16)
    p.add_argument("--chunks", type=int, default=20)
    p.add_argument("--no-churn", action="store_true",
                   help="skip the continuous-batching churn phase")
    p.add_argument("--tiny", action="store_true",
                   help="toy generator (CPU smoke test of the harness)")
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from articulatory_tpu.inference import LoadedModel
    from articulatory_tpu.models import HiFiGANGenerator
    from articulatory_tpu.streaming import StreamingSynthesizer

    hop = 80
    config = {"dataset_mode": "a2w", "batch_max_steps": 8000, "hop_size": hop,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 512}}
    if args.tiny:
        model = HiFiGANGenerator(
            in_channels=13 + 8, out_channels=1, channels=16, kernel_size=7,
            upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            use_ar=True, ar_input=512, ar_hidden=8, ar_output=8)
    else:
        model = HiFiGANGenerator(
            in_channels=141, out_channels=1, channels=512, kernel_size=7,
            upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
            resblock_kernel_sizes=(3, 7, 11),
            resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
            use_ar=True, ar_input=512, ar_hidden=256, ar_output=128)
    c0 = jnp.zeros((1, 100, 13))
    v = model.init(jax.random.PRNGKey(0), c0,
                   ar=jnp.zeros((1, 512, 1), jnp.float32))
    loaded = LoadedModel(model=model, params=jax.device_put(v["params"]),
                         config=config, mutables={})

    rng = np.random.default_rng(0)

    # single-stream serving latency, three disciplines (0.5 s audio/chunk):
    #  - synced: host readback after EVERY chunk (interactive worst case)
    #  - pipelined: synthesize(pipeline_depth=2) keeps 2 chunks in flight
    #  - scan: synthesize_all, one dispatch for the whole known stream
    syn1 = StreamingSynthesizer(loaded, config, batch=1)
    feats = rng.standard_normal((100 * args.chunks, 13)).astype(np.float32)
    for c in syn1.synthesize(feats):  # compile both paths
        pass
    _ = syn1.synthesize_all(feats[:100 * 2])  # compile scan (tiny)
    syn1.reset()
    start = time.perf_counter()
    for i in range(args.chunks):
        np.asarray(syn1.synthesize_chunk(feats[i * 100:(i + 1) * 100]))
    ms = 1000 * (time.perf_counter() - start) / args.chunks
    print(f"  1 stream,   synced: {ms:6.1f} ms/chunk "
          f"({500 / ms:.1f}x realtime)")
    syn1.reset()
    start = time.perf_counter()
    for _ in syn1.synthesize(feats, pipeline_depth=2):
        pass
    ms = 1000 * (time.perf_counter() - start) / args.chunks
    print(f"  1 stream, pipelined: {ms:6.1f} ms/chunk "
          f"({500 / ms:.1f}x realtime)")
    _ = syn1.synthesize_all(feats)  # compile full length
    start = time.perf_counter()
    _ = syn1.synthesize_all(feats)
    ms = 1000 * (time.perf_counter() - start) / args.chunks
    print(f"  1 stream,      scan: {ms:6.1f} ms/chunk "
          f"({500 / ms:.1f}x realtime)")

    streams = 1
    while streams <= args.max_streams:
        syn = StreamingSynthesizer(loaded, config, batch=streams)
        chunk = rng.standard_normal((streams, 100, 13)).astype(np.float32)
        np.asarray(syn.synthesize_chunk(chunk))  # compile
        start = time.perf_counter()
        for _ in range(args.chunks):
            out = syn.synthesize_chunk(chunk)
        np.asarray(out)
        el = time.perf_counter() - start
        ms = 1000 * el / args.chunks
        # each chunk is 100 frames = 0.5 s of audio per stream
        print(f"{streams:3d} stream(s): {ms:6.1f} ms/chunk "
              f"({500 / ms:.1f}x realtime per stream)")
        streams *= 4

    if not args.no_churn:
        churn_bench(loaded, config, rng, args)


def churn_bench(loaded, config, rng, args):
    """Continuous-batching churn: per-round step() latency (p50/p99) while
    streams arrive and depart — 1 stream -> ramp to max_lanes -> drop to 4.
    One fixed-width executable serves every occupancy level, so the only
    latency question is what the synchronous round costs under churn."""
    from articulatory_tpu.streaming import StreamingServer

    lanes = args.max_streams
    server = StreamingServer(loaded, config, max_lanes=lanes)
    mk = lambda: rng.standard_normal((100, 13)).astype(np.float32)

    server.join(0)
    server.step({0: mk()})  # compile the (lanes, mask) executable once

    phases = []  # (label, occupancy, latencies)
    next_id = [1]

    def run_rounds(label, n_rounds, join_per_round=0, leave_per_round=0):
        lat = []
        for _ in range(n_rounds):
            for _ in range(join_per_round):
                if len(server.active) < lanes:
                    server.join(next_id[0])
                    next_id[0] += 1
            for _ in range(leave_per_round):
                if len(server.active) > 4:
                    server.leave(server.active[0])
            subs = {c: mk() for c in server.active}
            t0 = time.perf_counter()
            server.step(subs)
            lat.append(1000 * (time.perf_counter() - t0))
        if lat:  # a phase can be empty at small --max-streams
            phases.append((label, len(server.active), lat))

    run_rounds("steady  1", 10)
    run_rounds(f"ramp ->{lanes}", lanes - 1, join_per_round=1)
    run_rounds(f"steady {lanes}", 10)
    run_rounds("drain -> 4", lanes - 4, leave_per_round=1)
    run_rounds("steady  4", 10)

    print(f"\nchurn (StreamingServer, max_lanes={lanes}, 0.5 s audio/chunk"
          f"/stream):")
    all_lat = []
    for label, occ, lat in phases:
        all_lat += lat
        p50, p99 = np.percentile(lat, [50, 99])
        print(f"  {label:>10} ({occ:2d} active): p50 {p50:6.1f} ms  "
              f"p99 {p99:6.1f} ms  ({500 / p50:.1f}x realtime/stream at p50)")
    p50, p99 = np.percentile(all_lat, [50, 99])
    print(f"  {'overall':>10}            : p50 {p50:6.1f} ms  "
          f"p99 {p99:6.1f} ms")


if __name__ == "__main__":
    main()
