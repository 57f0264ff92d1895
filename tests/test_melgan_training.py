"""MelGAN and StyleMelGAN one-step training coverage.

The reference trains these families through the same GAN trainer as HiFi-GAN
(reference bin/train.py model registry); here we assert one jitted train step
runs end-to-end for each: generator update, discriminator update (random
windows + PQMF bands for StyleMelGAN), and finite losses.
"""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    MelGANGenerator,
    MelGANMultiScaleDiscriminator,
    StyleMelGANDiscriminator,
    StyleMelGANGenerator,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def _config(batch_max_steps):
    return {
        "dataset_mode": "default",
        "batch_max_steps": batch_max_steps, "hop_size": 16,
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


def _run_step(gen, disc, config, x, y, init_args):
    key = jax.random.PRNGKey(0)
    vg = gen.init({"params": key, "noise": key}, *init_args)
    vd = disc.init({"params": key, "window": key}, y)
    tx = build_optimizer("Adam", {"betas": (0.5, 0.9)})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx))
    b = {"x": x, "y": y}
    s1, m = step(state, b, jax.random.PRNGKey(1),
                 jnp.float32(1e-4), jnp.float32(1e-4))
    assert np.isfinite(float(m["train/generator_loss"]))
    assert np.isfinite(float(m["train/discriminator_loss"]))
    # both towers actually updated
    d0 = jax.tree.leaves(state.params_g)[0]
    d1 = jax.tree.leaves(s1.params_g)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    return s1, m


def test_melgan_train_step(rng):
    gen = MelGANGenerator(in_channels=20, channels=64, kernel_size=7,
                          upsample_scales=(4, 4), stacks=2)
    disc = MelGANMultiScaleDiscriminator(
        scales=2, channels=8, max_downsample_channels=32,
        downsample_scales=(2, 2))
    t = 50
    c = jnp.asarray(rng.standard_normal((2, t, 20)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, t * 16, 1)) * 0.1, jnp.float32)
    _, m = _run_step(gen, disc, _config(t * 16), (c,), y, (c,))
    assert np.isfinite(float(m["train/spectral_convergence_loss"]))


def test_style_melgan_train_step(rng):
    gen = StyleMelGANGenerator(
        in_channels=8, aux_channels=10, channels=16, kernel_size=9,
        noise_upsample_scales=(4, 4), upsample_scales=(2, 2, 2, 2, 2))
    disc = StyleMelGANDiscriminator(
        repeats=2, window_sizes=(32, 64, 128, 256),
        pqmf_params=((1, None, None, None), (2, 62, 0.267, 9.0),
                     (4, 62, 0.142, 9.0), (8, 62, 0.07949, 9.0)),
        discriminator_params={
            "out_channels": 1, "kernel_sizes": [5, 3], "channels": 8,
            "max_downsample_channels": 32, "bias": True,
            "downsample_scales": [2, 2, 1],
            "nonlinear_activation": "LeakyReLU",
            "nonlinear_activation_params": {"negative_slope": 0.2},
            "pad": "ReflectionPad1d", "pad_params": {}})
    # z is (B, 1, in) per reference (style_melgan.py:136-140), so aux length
    # must equal the noise-upsample factor (16); audio = 16 * 32 = 512.
    t = 16
    c = jnp.asarray(rng.standard_normal((2, t, 10)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, t * 32, 1)) * 0.1, jnp.float32)
    _run_step(gen, disc, _config(t * 32), (c,), y, (c,))
