#!/usr/bin/env python3
"""Training-throughput benchmark: full-size E2W HiFi-GAN GAN step on one chip.

Measures steady-state wall time of the single jitted train step (generator
update -> fake regeneration -> discriminator update) at the flagship config's
shapes (conf/e2w_hifigan.yaml: channels 512, 80x upsample, MSMPD disc,
mel + feat-match + adversarial losses) and prints samples/sec/chip.

Run: python benchmarks/train_bench.py [--batch 16] [--steps 20]
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
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--batch-max-steps", type=int, default=8000)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--time-packing", action="store_true",
                   help="enable the exact-equivalence space-to-depth packing "
                        "on the generator's narrow late stages")
    p.add_argument("--gen-bf16", action="store_true",
                   help="generator conv stack in bfloat16 (params f32)")
    p.add_argument("--gen-hybrid", action="store_true", default=True,
                   help="hybrid precision: f32 input conv + final "
                        "upsample/MRF stage + output conv around a bf16 "
                        "interior. DEFAULT ON since the training-quality "
                        "A/B passed (tools/artifacts/"
                        "hybrid_train_quality_ab.json: inside the f32 "
                        "1-ulp noise cone, GT-MCD delta 0.035 dB); "
                        "133.9 ms vs 138.7 f32 at 32x8000 (+3.6%%). "
                        "--f32 disables.")
    p.add_argument("--f32", dest="gen_hybrid", action="store_false",
                   help="pure-f32 generator (the pre-round-4 default)")
    p.add_argument("--fuse-disc", action="store_true",
                   help="A/B: batched-concat [real; fake] disc forward "
                        "(fuse_disc_passes; measured +3% step time on v5e "
                        "at 32x8000 -> default off)")
    p.add_argument("--remat", action="store_true",
                   help="A/B: rematerialize the generator forward in the "
                        "gen update (config use_remat) — trades an extra "
                        "forward's FLOPs for the saved activations' HBM "
                        "traffic; the step is bandwidth-bound, so this can "
                        "go either way")
    p.add_argument("--disc-bf16", action="store_true",
                   help="all 8 discriminators in bfloat16 (A/B: measured "
                        "slower than f32 pre-MXU-rewrites; re-testable here "
                        "with the rewrites on)")
    args = p.parse_args()
    if args.gen_bf16:
        args.gen_hybrid = False  # pure-bf16 A/B, not hybrid

    import jax

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

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

    hop = 80
    config = {
        "dataset_mode": "a2w",
        "batch_max_steps": args.batch_max_steps, "hop_size": hop,
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
        "fuse_disc_passes": args.fuse_disc,
        "use_remat": args.remat,
    }
    gen = HiFiGANGenerator(
        in_channels=141, out_channels=1, channels=512, kernel_size=7,
        upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        use_ar=True, ar_input=512, ar_hidden=256, ar_output=128,
        time_packing="auto" if args.time_packing else None,
        compute_dtype=(jnp.bfloat16 if args.gen_bf16 or args.gen_hybrid
                       else None),
        hybrid_precision=args.gen_hybrid)
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        compute_dtype=jnp.bfloat16 if args.disc_bf16 else None)

    b, t = args.batch, args.batch_max_steps
    rng = np.random.default_rng(0)
    batch = {
        "x": (jnp.asarray(rng.standard_normal((b, t // hop, 13)), jnp.float32),),
        "y": jnp.asarray(rng.standard_normal((b, t, 1)) * 0.1, jnp.float32),
        "ar": jnp.asarray(rng.standard_normal((b, 512, 1)) * 0.1, jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, batch["x"][0], ar=batch["ar"])
    vd = disc.init(key, batch["y"])
    tx = build_optimizer("Adam", {"betas": [0.5, 0.9]})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx), donate_argnums=(0,))

    lr = jnp.float32(1e-4)
    state, m = step(state, batch, jax.random.PRNGKey(1), lr, lr)  # compile
    float(m["train/generator_loss"])

    start = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, batch, jax.random.PRNGKey(2 + i), lr, lr)
    float(m["train/generator_loss"])  # transitively syncs the whole chain
    elapsed = time.perf_counter() - start

    ms = 1000 * elapsed / args.steps
    sps = args.steps * b * t / elapsed
    print(f"train step: {ms:.1f} ms @ batch {b} x {t} samples "
          f"-> {sps / 1e3:.0f}k train samples/sec/chip")


if __name__ == "__main__":
    main()
