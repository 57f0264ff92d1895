#!/usr/bin/env python3
"""Latency vs. input-length sweep for a generator config.

Parity target: reference articulatory/bin/model_stats.py (which is broken —
imports nonexistent classes). This version works: it builds the generator
from a yaml config and reports per-length forward latency and RTF on the
current default device.

Usage: python -m articulatory_tpu.bin.model_stats --config conf.yaml \
    [--lengths 100 200 400] [--iters 5]
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from articulatory_tpu.config import fix_generator_params
from articulatory_tpu.models import build_model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--lengths", type=int, nargs="+",
                        default=[50, 100, 200, 400, 800])
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    from articulatory_tpu.utils.platform import honor_jax_platforms

    honor_jax_platforms()

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)
    gp = fix_generator_params(config["generator_params"])
    model = build_model(config["generator_type"], gp)
    use_ar = gp.get("use_ar", False)
    in_feats = gp["in_channels"] - (gp.get("ar_output", 128) if use_ar else 0)
    sr = config.get("sampling_rate", 16000)
    hop = config.get("hop_size", 256)

    n_params = None
    for t in args.lengths:
        c = jnp.zeros((args.batch, t, in_feats), jnp.float32)
        kwargs = {}
        if use_ar:
            kwargs["ar"] = jnp.zeros(
                (args.batch, gp.get("ar_input", 512),
                 gp.get("out_channels", 1)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), c, **kwargs)
        if n_params is None:
            n_params = sum(int(np.prod(p.shape))
                           for p in jax.tree.leaves(variables["params"]))
            print(f"generator params: {n_params:,}")

        fwd = jax.jit(lambda p, c, kw: jnp.sum(model.apply({"params": p}, c, **kw)))
        float(fwd(variables["params"], c, kwargs))  # compile
        start = time.perf_counter()
        for _ in range(args.iters):
            float(fwd(variables["params"], c, kwargs))
        per_call = (time.perf_counter() - start) / args.iters
        audio_sec = t * hop / sr * args.batch
        print(f"len={t:6d} frames  ({t * hop / sr:6.2f}s audio)  "
              f"latency={per_call * 1e3:8.2f} ms  RTF={per_call / audio_sec:.5f}")


if __name__ == "__main__":
    main()
