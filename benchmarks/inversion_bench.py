#!/usr/bin/env python3
"""w2a inversion benchmark: speech -> EMA throughput on one chip.

Two flagship inversion models (reference predict_ema.py workloads):
  - BiGRU (hidden 256) over HuBERT-large features (1024-d at 200 Hz after
    x4 interpolation) -> 12-ch EMA, the reference's acoustic-to-articulatory
    recipe (reference pytorch_models.py:22-72).
  - BiGRU over 13-d z-scored MFCCs at 200 Hz (hop 80).

Metric: audio seconds inverted per second per chip (realtime multiple at
16 kHz) processing the full bidirectional recurrence. The BiGRU recurrence
is a lax.scan over time inside one jitted call; utterances are batched to
fill the chip.

Run: python benchmarks/inversion_bench.py [--batch 16] [--seconds 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

SR = 16000
FRAME_RATE = 200  # 200 Hz features (MFCC hop 80 / HuBERT x4-interp)


def bench_bigru(in_feats: int, name: str, batch: int, seconds: float,
                iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from articulatory_tpu.models import BiGRU

    model = BiGRU(in_channels=in_feats, hidden_size=256, out_channels=12)
    t = int(seconds * FRAME_RATE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, t, in_feats)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:, :16], train=False)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    out = fwd(variables, x)
    float(jnp.sum(out))  # compile + sync (host readback)

    start = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
        float(jnp.sum(out))
    elapsed = time.perf_counter() - start

    audio_seconds = iters * batch * seconds
    rt = audio_seconds / elapsed
    return {
        "metric": f"w2a_bigru_{name}_inversion_throughput",
        "value": round(rt * SR, 1),
        "unit": "samples_per_sec_per_chip",
        "vs_baseline": round(rt / 50.0, 3),  # 50x realtime target
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    for in_feats, name in ((1024, "hubert"), (13, "mfcc")):
        print(json.dumps(bench_bigru(in_feats, name, args.batch,
                                     args.seconds, args.iters)))


if __name__ == "__main__":
    main()
