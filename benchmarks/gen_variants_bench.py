#!/usr/bin/env python3
"""Generator forward variants at training shapes: baseline vs time_packing
vs bf16 compute.

Round 1 measured time_packing as "2x on an isolated narrow stage, neutral
end-to-end" on the synthesis path; this re-measures at the training shapes
(B x 100 frames -> B x 8000 samples, one full forward per sync) where the
late narrow-channel stages (C=64/32 at 8-16 kHz rates) are the biggest
slice of gen_fwd.

Run: python benchmarks/gen_variants_bench.py [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from articulatory_tpu.models import HiFiGANGenerator

    base = dict(
        in_channels=141, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        use_ar=True, ar_input=512, ar_hidden=256, ar_output=128)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, args.frames, 13)),
                    jnp.float32)
    ar = jnp.asarray(rng.standard_normal((args.batch, 512, 1)) * 0.1,
                     jnp.float32)

    variants = {
        "baseline": {},
        "time_packing_auto": {"time_packing": "auto"},
        "bf16": {"compute_dtype": jnp.bfloat16},
    }
    for name, extra in variants.items():
        model = HiFiGANGenerator(**base, **extra)
        params = model.init(jax.random.PRNGKey(0), x, ar=ar)["params"]
        fwd = jax.jit(
            lambda p, c, a, m=model: m.apply({"params": p}, c, ar=a))
        out = fwd(params, x, ar)
        float(jnp.sum(out))  # compile + sync
        start = time.perf_counter()
        outs = [fwd(params, x, ar) for _ in range(args.iters)]
        float(jnp.sum(outs[-1]))  # one pipelined sync
        t = (time.perf_counter() - start) / args.iters
        print(json.dumps({name: {
            "ms": round(t * 1e3, 3),
            "samples_per_sec": round(args.batch * args.frames * 80 / t, 1),
        }}), flush=True)


if __name__ == "__main__":
    main()
