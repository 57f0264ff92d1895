#!/usr/bin/env python3
"""Decode-side roofline on one chip (VERDICT r4 #4).

Applies benchmarks/step_breakdown.py's measured-cost methodology to the
DECODE workloads that back the headline numbers:

  batched_chunk    the bench.py headline path: one AR chunk forward at the
                   batch-112 knee (hybrid precision + time packing, 8000
                   samples/utterance/chunk)
  batched_chunk_f32  the same executable in pure f32
  single_scan      the single-stream compiled-scan path (bin/decode
                   --ar-scan): one lax.scan dispatch over a 30 s utterance

For each: XLA cost_analysis (flops / bytes accessed), measured wall time
(pipelined dispatches, one host-readback sync — the only reliable sync on
the axon relay), achieved TFLOP/s and HBM GB/s as fractions of v5e peak
(197 bf16 / 98.5 f32 TFLOP/s, 819 GB/s HBM), and the implied throughput.
The table + reading live in docs/DESIGN.md §7 (decode roofline).

Run: python benchmarks/decode_breakdown.py [--batch 112] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 98.5e12
V5E_PEAK_HBM_BYTES = 819e9
HOP = 80
CHUNK_FRAMES = 100      # batch_max_steps 8000 / hop 80
CHUNK_SAMPLES = CHUNK_FRAMES * HOP
AR_INPUT = 512


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _build(f32: bool):
    import jax.numpy as jnp

    from articulatory_tpu.models import HiFiGANGenerator

    return HiFiGANGenerator(
        in_channels=141, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        use_ar=True, ar_input=AR_INPUT, ar_hidden=256, ar_output=128,
        time_packing="auto", compute_dtype=None if f32 else jnp.bfloat16,
        hybrid_precision=not f32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=112)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--scan-seconds", type=float, default=30.0,
                   help="utterance length for the single-stream scan stage")
    p.add_argument("--bf16-weights", action="store_true",
                   help="ALSO run the stages with bf16-stored weights "
                        "(LoadedModel.to_bf16_weights): the single-stream "
                        "scan is weight-bandwidth-bound, so this is the "
                        "direct A/B for the residency lever")
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    results = {}

    def report(name, seconds, flops, bytes_, samples, f32):
        peak = V5E_PEAK_F32_FLOPS if f32 else V5E_PEAK_BF16_FLOPS
        results[name] = {
            "ms": round(seconds * 1e3, 2),
            "tflops_per_s": round(flops / seconds / 1e12, 1) if flops else None,
            "pct_peak_flops": round(100 * flops / seconds / peak, 1)
            if flops else None,
            "hbm_gb_per_s": round(bytes_ / seconds / 1e9, 1) if bytes_ else None,
            "pct_peak_hbm": round(100 * bytes_ / seconds
                                  / V5E_PEAK_HBM_BYTES, 1) if bytes_ else None,
            "samples_per_sec_per_chip": round(samples / seconds, 1),
            "flops_per_dispatch": flops, "bytes_per_dispatch": bytes_,
        }
        print(json.dumps({name: results[name]}), flush=True)

    # ---- batched AR chunk forward (the bench.py inner loop) ----
    for f32 in (False, True):
        model = _build(f32)
        cin = jnp.asarray(
            rng.standard_normal((args.batch, CHUNK_FRAMES, 13)), jnp.float32)
        ar0 = jnp.zeros((args.batch, AR_INPUT, 1), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), cin, ar=ar0)["params"]

        def chunk_fwd(params, cin, prev):
            out = model.apply({"params": params}, cin, ar=prev)
            return out, out[:, -AR_INPUT:, :]

        compiled = jax.jit(chunk_fwd).lower(params, cin, ar0).compile()
        flops, bytes_ = _cost(compiled)
        out, prev = compiled(params, cin, ar0)
        float(jnp.sum(out))  # warm + sync
        start = time.perf_counter()
        prev_i = ar0
        for _ in range(args.iters):  # AR-chained like production
            out, prev_i = compiled(params, cin, prev_i)
        float(jnp.sum(out))
        t = (time.perf_counter() - start) / args.iters
        report("batched_chunk" + ("_f32" if f32 else ""), t, flops, bytes_,
               args.batch * CHUNK_SAMPLES, f32)

    # ---- single-stream compiled scan (bin/decode --ar-scan) ----
    from articulatory_tpu.inference import LoadedModel, _get_scan_fn

    n_chunks = int(args.scan_seconds * 200) // CHUNK_FRAMES
    variants = [("single_scan", False)]
    if args.bf16_weights:
        variants.append(("single_scan_bf16w", True))
    for name, bf16w in variants:
        model = _build(False)
        cin = jnp.asarray(
            rng.standard_normal((1, CHUNK_FRAMES, 13)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), cin,
                            ar=jnp.zeros((1, AR_INPUT, 1)))["params"]
        config = {"dataset_mode": "a2w",
                  "batch_max_steps": CHUNK_SAMPLES * 1, "hop_size": HOP,
                  "generator_params": {"out_channels": 1, "use_ar": True,
                                       "ar_input": AR_INPUT}}
        loaded = LoadedModel(model=model, params=params, config=config,
                             mutables={})
        if bf16w:
            loaded.to_bf16_weights()
        run = _get_scan_fn(loaded, AR_INPUT, 1, True)
        chunks = jnp.asarray(
            rng.standard_normal((n_chunks, CHUNK_FRAMES, 13)), jnp.float32)
        compiled = jax.jit(lambda p, c: run(p, c)).lower(
            loaded.params, chunks).compile()
        flops, bytes_ = _cost(compiled)
        # XLA cost_analysis counts a while/scan BODY once, not x trip count
        # (verified: the reported per-chunk flops are exactly n_chunks-fold
        # under the batched per-lane figure) — scale to the real dispatch
        flops, bytes_ = flops * n_chunks, bytes_ * n_chunks
        float(jnp.sum(compiled(loaded.params, chunks)))  # warm + sync
        iters = max(3, args.iters // 4)
        start = time.perf_counter()
        for _ in range(iters):
            out = compiled(loaded.params, chunks)
        float(jnp.sum(out))
        t = (time.perf_counter() - start) / iters
        report(name, t, flops, bytes_, n_chunks * CHUNK_SAMPLES, False)
        results[name]["rtf"] = round(
            t / (n_chunks * CHUNK_SAMPLES / 16000), 5)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
