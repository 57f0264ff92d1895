#!/usr/bin/env python3
"""Train-step time breakdown + analytic roofline on one chip.

Decomposes the flagship E2W GAN step (channels 512, 80x upsample, MSMPD
disc, mel + FM + adv losses, batch B x 8000 samples) into separately-jitted
stages and times each with a host-readback sync (the only reliable sync on
the axon relay platform):

  gen_fwd       generator forward
  gen_fwd_bwd   generator forward + backward (aux mel loss only)
  disc_fwd      all 8 discriminators forward
  disc_fwd_bwd  discriminator LSGAN loss forward + backward
  mel_loss      framed STFT -> mel -> log L1 (the aux loss)
  full_step     the real fused train step (gen update + regen + disc update)

Each stage also reports XLA's own cost analysis (flops / bytes accessed)
and the achieved fraction of v5e peak (197 bf16 TFLOP/s, 819 GB/s HBM),
substantiating the roofline claims in docs/DESIGN.md §7.

Run: python benchmarks/step_breakdown.py [--batch 32] [--dtype f32|bf16]
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
V5E_PEAK_HBM_BYTES = 819e9
HOP = 80


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _first_leaf(out):
    while isinstance(out, (tuple, list, dict)):
        out = next(iter(out.values())) if isinstance(out, dict) else out[0]
    return out


def _time(fn, args, iters=10):
    """Time a (pre-compiled) callable: queue ``iters`` async dispatches, then
    ONE host readback. TPU streams execute in order, so the final sum
    transitively syncs every queued iteration — per-iteration readbacks
    would add the ~30 ms relay round trip to every stage (the axon platform
    has no reliable block_until_ready; only host readback syncs)."""
    import jax.numpy as jnp

    float(jnp.sum(_first_leaf(fn(*args))))  # warmup + sync
    start = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(_first_leaf(outs[-1])))
    return (time.perf_counter() - start) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--batch-max-steps", type=int, default=8000)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bf16-disc", action="store_true",
                   help="run the discriminator conv stacks in bfloat16 "
                        "(params f32, fmaps cast back to f32)")
    p.add_argument("--time-packing", action="store_true",
                   help="enable the exact-equivalence space-to-depth packing "
                        "on the generator (the shipped default for training) "
                        "so the full-step cost analysis matches production")
    args = p.parse_args()

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from articulatory_tpu.losses.mel_loss import MelSpectrogramLoss
    from articulatory_tpu.models import (
        HiFiGANGenerator,
        HiFiGANMultiScaleMultiPeriodDiscriminator,
    )
    from articulatory_tpu.train.gan import (
        GANCriterion,
        GANTrainState,
        make_train_step,
    )
    from articulatory_tpu.train.optimizers import build_optimizer

    B, T = args.batch, args.batch_max_steps
    frames = T // HOP
    config = {
        "dataset_mode": "a2w", "batch_max_steps": T, "hop_size": HOP,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 1024, "hop_size": 256,
                            "num_mels": 80, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": True,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0, "lambda_feat_match": 2.0,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": True,
                             "ar_input": 512},
    }
    gen = HiFiGANGenerator(
        in_channels=141, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        use_ar=True, ar_input=512, ar_hidden=256, ar_output=128,
        time_packing="auto" if args.time_packing else None)
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        compute_dtype=jnp.bfloat16 if args.bf16_disc else None)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, frames, 13)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, T, 1)) * 0.1, jnp.float32)
    ar = jnp.asarray(rng.standard_normal((B, 512, 1)) * 0.1, jnp.float32)
    batch = {"x": (x,), "y": y, "ar": ar}

    key = jax.random.PRNGKey(0)
    params_g = gen.init(key, x, ar=ar)["params"]
    params_d = disc.init(key, jnp.concatenate([ar, y], axis=1))["params"]

    mel_loss = MelSpectrogramLoss(**config["mel_loss_params"])

    results = {}

    def stage(name, fn, *stage_args):
        """Compile ONCE (AOT; the compiled object serves both cost analysis
        and timing — a second jit-path compile would double every stage's
        multi-minute remote compile), time, and print incrementally."""
        compiled = jax.jit(fn).lower(*stage_args).compile()
        flops, bytes_ = _cost(compiled)
        t = _time(compiled, stage_args, args.iters)
        report(name, t, flops, bytes_)
        print(json.dumps({name: results[name]}), flush=True)
        return compiled

    def report(name, seconds, flops, bytes_):
        results[name] = {
            "ms": round(seconds * 1e3, 2),
            "tflops_per_s": round(flops / seconds / 1e12, 1) if flops else None,
            "pct_peak_flops": round(100 * flops / seconds
                                    / V5E_PEAK_BF16_FLOPS, 1) if flops else None,
            "hbm_gb_per_s": round(bytes_ / seconds / 1e9, 1) if bytes_ else None,
            "pct_peak_hbm": round(100 * bytes_ / seconds
                                  / V5E_PEAK_HBM_BYTES, 1) if bytes_ else None,
        }

    # --- generator forward ---
    stage("gen_fwd", lambda p, x, ar: gen.apply({"params": p}, x, ar=ar),
          params_g, x, ar)

    # --- generator forward+backward on the aux mel loss ---
    def gen_aux(p):
        y_ = gen.apply({"params": p}, x, ar=ar)
        return mel_loss(y_[..., 0], y[..., 0])

    stage("gen_fwd_bwd_mel", jax.grad(gen_aux), params_g)

    # --- discriminators forward (disc input = AR context + window) ---
    disc_in = jnp.concatenate([ar, y], axis=1)
    stage("disc_fwd_x8", lambda p, z: disc.apply({"params": p}, z),
          params_d, disc_in)

    # --- discriminator loss forward+backward ---
    def disc_loss(p):
        outs = disc.apply({"params": p}, disc_in)
        return sum(jnp.mean((o[-1] - 1.0) ** 2) for o in outs)

    stage("disc_fwd_bwd_x8", jax.grad(disc_loss), params_d)

    # --- mel loss alone ---
    stage("mel_loss", lambda a, b: mel_loss(a[..., 0], b[..., 0]), y, y)

    # --- full fused train step ---
    tx_g = build_optimizer("Adam", {"betas": [0.5, 0.9]})
    tx_d = build_optimizer("Adam", {"betas": [0.5, 0.9]})
    state = GANTrainState(
        params_g=params_g, params_d=params_d,
        opt_g=tx_g.init(params_g), opt_d=tx_d.init(params_d),
        steps=jnp.asarray(0, jnp.int32))
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx_g, tx_d), donate_argnums=(0,))
    step = step.lower(state, batch, jax.random.PRNGKey(1),
                      jnp.float32(1e-4), jnp.float32(1e-4)).compile()
    flops, bytes_ = _cost(step)

    new_state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              jnp.float32(1e-4), jnp.float32(1e-4))
    float(metrics["train/generator_loss"])
    start = time.perf_counter()
    for i in range(args.iters):
        new_state, metrics = step(new_state, batch, jax.random.PRNGKey(i),
                                  jnp.float32(1e-4), jnp.float32(1e-4))
    float(metrics["train/generator_loss"])  # transitively syncs the chain
    t = (time.perf_counter() - start) / args.iters
    report("full_step", t, flops, bytes_)
    results["full_step"]["samples_per_sec_per_chip"] = round(B * T / t, 1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
