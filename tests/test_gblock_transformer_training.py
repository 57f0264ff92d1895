"""Train-step coverage for the remaining generator families:
GBlockGenerator (a2w synthesis, GAN-TTS blocks) and Transformer
(Gaddy&Klein silent-speech inversion, w2a-style L1 target).

With these, every generator class in the registry has a one-step jitted
training test (HiFiGAN: test_train_step; PWG: test_pwg_training; MelGAN +
StyleMelGAN: test_melgan_training; BiGRU: test_w2a_training).
"""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    GBlockGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
    Transformer,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def _small_msmpd(in_channels=1):
    return HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1,
        scale_discriminator_params={"in_channels": in_channels, "channels": 8,
                                    "max_downsample_channels": 16,
                                    "max_groups": 2},
        periods=[2],
        period_discriminator_params={"in_channels": in_channels, "channels": 2,
                                     "max_downsample_channels": 4})


def _finite_step(gen, disc, config, batch, init_kwargs):
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, batch["x"][0], **init_kwargs)
    vd = disc.init({"params": key, "window": key}, batch["y"])
    tx = build_optimizer("Adam", {"betas": (0.5, 0.9)})
    state = GANTrainState(
        params_g=vg["params"], params_d=vd["params"],
        opt_g=tx.init(vg["params"]), opt_d=tx.init(vd["params"]),
        steps=jnp.asarray(1, jnp.int32),
        mutables_g={k: v for k, v in vg.items() if k != "params"})
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx))
    s1, m = step(state, batch, jax.random.PRNGKey(1),
                 jnp.float32(1e-4), jnp.float32(1e-4))
    assert np.isfinite(float(m["train/generator_loss"]))
    assert np.isfinite(float(m["train/discriminator_loss"]))
    g0, g1 = jax.tree.leaves(state.params_g)[0], jax.tree.leaves(s1.params_g)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))


def test_gblock_train_step(rng):
    config = {
        "dataset_mode": "default",
        "batch_max_steps": 800, "hop_size": 16,
        "use_stft_loss": True,
        "stft_loss_params": {"fft_sizes": [128], "hop_sizes": [32],
                             "win_lengths": [64]},
        "use_mel_loss": False, "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": True},
        "discriminator_adv_loss_params": {"average_by_discriminators": True},
        "lambda_aux": 1.0, "lambda_adv": 4.0,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": False},
    }
    # GBlock requires odd kernels (reference pytorch_layers.py:38 "Assumes
    # kernel_size is odd i think" — even kernels break the residual add in
    # torch too; mirrored here).
    gen = GBlockGenerator(in_channels=13, channels=16, kernel_size=7,
                          g_scales=(4, 4), g_kernel_sizes=(9, 9))
    t = 50
    batch = {
        "x": (jnp.asarray(rng.standard_normal((2, t, 13)), jnp.float32),),
        "y": jnp.asarray(rng.standard_normal((2, t * 16, 1)) * 0.1, jnp.float32),
    }
    _finite_step(gen, _small_msmpd(), config, batch, {})


def test_transformer_train_step(rng):
    config = {
        "dataset_mode": "w2a",
        "batch_max_steps": 800, "hop_size": 80,
        "use_stft_loss": False, "use_mel_loss": True,
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 4, "use_ar": False},
    }
    gen = Transformer(in_channels=1, out_channels=4, elayers=1, hidden_dim=16)
    b, t = 2, 800
    x = jnp.asarray(rng.standard_normal((b, t, 1)) * 0.1, jnp.float32)
    # Transformer conv frontend downsamples time 8x (3 stride-2 ResBlocks)
    y_len = gen.apply(gen.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, x), x).shape[1]
    batch = {"x": (x,),
             "y": jnp.asarray(rng.standard_normal((b, y_len, 4)), jnp.float32)}
    _finite_step(gen, _small_msmpd(in_channels=4), config, batch, {})
