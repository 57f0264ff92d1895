"""Multiband vocoding: out_channels>1 generator + PQMF synthesis + subband
STFT loss through the train step (reference train.py:281-283, 301-312)."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    HiFiGANGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def test_multiband_train_step(rng):
    subbands = 4
    hop = 80
    config = {
        "dataset_mode": "a2w",
        "batch_max_steps": 1600, "hop_size": hop,
        "pqmf": True,
        "use_stft_loss": True,
        "stft_loss_params": {"fft_sizes": [256], "hop_sizes": [64],
                             "win_lengths": [128]},
        "use_subband_stft_loss": True,
        "subband_stft_loss_params": {"fft_sizes": [128], "hop_sizes": [32],
                                     "win_lengths": [64]},
        "use_mel_loss": False, "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 1.0, "lambda_adv": 1.0,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": subbands, "use_ar": False},
    }
    # multiband: generator upsamples hop/subbands, PQMF synthesis restores hop
    gen = HiFiGANGenerator(in_channels=13, out_channels=subbands, channels=16,
                           upsample_scales=(5, 2, 2),
                           upsample_kernel_sizes=(10, 4, 4),
                           resblock_kernel_sizes=(3,), resblock_dilations=((1,),))
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1, scale_discriminator_params={"channels": 8,
                                              "max_downsample_channels": 16,
                                              "max_groups": 2},
        periods=[2], period_discriminator_params={"channels": 2,
                                                  "max_downsample_channels": 4})
    B, frames = 2, 20
    batch = {
        "x": (jnp.asarray(rng.standard_normal((B, frames, 13)), jnp.float32),),
        "y": jnp.asarray(rng.standard_normal((B, frames * hop, 1)) * 0.1,
                         jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, batch["x"][0])
    # generator emits (B, frames * hop / subbands, subbands)
    y_mb = gen.apply(vg, batch["x"][0])
    assert y_mb.shape == (B, frames * hop // subbands, subbands)
    vd = disc.init({"params": key, "window": key}, batch["y"])
    tx = build_optimizer("Adam", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    crit = GANCriterion(config)
    assert crit.multiband
    step = jax.jit(make_train_step(gen, disc, crit, config, tx, tx))
    s1, m = step(state, batch, jax.random.PRNGKey(1),
                 jnp.float32(1e-4), jnp.float32(1e-4))
    for k in ("train/spectral_convergence_loss",
              "train/sub_spectral_convergence_loss",
              "train/generator_loss", "train/discriminator_loss"):
        assert np.isfinite(float(m[k])), k
