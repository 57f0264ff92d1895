#!/usr/bin/env python3
"""Per-layer discriminator timing: where do the MSMPD's milliseconds go?

Times prefix stacks of increasing depth for one scale discriminator and one
period discriminator at flagship shapes (B x 8512 waveform) — successive
differences give per-layer cost. Guides (or rules out) a Pallas kernel for
the training side: if time concentrates in the grouped k=41 Conv1d layers
or the (5,1)-kernel Conv2d stack, those are the targets; if it is spread
thin, XLA is already near the roofline and a kernel cannot win much.

Run: python benchmarks/disc_layers_bench.py [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def _time(fn, args, iters=20):
    """Pipelined timing: queue all dispatches, one readback sync at the end
    (per-iter readbacks would add the ~30 ms relay round trip each)."""
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
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import flax.linen as nn

    from articulatory_tpu.models.hifigan import (
        HiFiGANPeriodDiscriminator,
        HiFiGANScaleDiscriminator,
    )

    dtype = jnp.bfloat16 if args.bf16 else None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, args.steps, 1)) * 0.1,
                    jnp.float32)
    results = {}

    class ScalePrefix(nn.Module):
        n_layers: int
        compute_dtype: object = None

        @nn.compact
        def __call__(self, z):
            full = HiFiGANScaleDiscriminator(compute_dtype=self.compute_dtype,
                                             name="d")
            outs = full(z)
            return outs[self.n_layers - 1]

    class PeriodPrefix(nn.Module):
        n_layers: int
        compute_dtype: object = None

        @nn.compact
        def __call__(self, z):
            full = HiFiGANPeriodDiscriminator(period=2,
                                              compute_dtype=self.compute_dtype,
                                              name="d")
            outs = full(z)
            return outs[self.n_layers - 1]

    for name, cls, n_total in (("scale", ScalePrefix, 8),
                               ("period2", PeriodPrefix, 6)):
        prev = 0.0
        for n in range(1, n_total + 1):
            m = cls(n_layers=n, compute_dtype=dtype)
            params = m.init(jax.random.PRNGKey(0), x)["params"]
            fwd = jax.jit(lambda p, z, m=m: m.apply({"params": p}, z))
            t = _time(fwd, (params, x), args.iters)
            results[f"{name}_prefix_{n}"] = {
                "ms": round(t * 1e3, 3),
                "layer_ms": round((t - prev) * 1e3, 3),
            }
            print(json.dumps({f"{name}_prefix_{n}": results[f"{name}_prefix_{n}"]}),
                  flush=True)
            prev = t


if __name__ == "__main__":
    main()
