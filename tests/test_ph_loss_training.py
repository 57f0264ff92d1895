"""use_ph_loss: auxiliary phoneme-classifier head on the HiFi-GAN generator
(reference hifigan.py:183-189/232-237, criterion["ph"] train.py:1735-1739).
One jitted train step with phoneme CE in the generator loss."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    HiFiGANGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def test_ph_loss_train_step(rng):
    num_ph = 5
    config = {
        "dataset_mode": "a2w",
        "batch_max_steps": 800, "hop_size": 16,
        "use_stft_loss": True,
        "stft_loss_params": {"fft_sizes": [128], "hop_sizes": [32],
                             "win_lengths": [64]},
        "use_mel_loss": False, "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": True},
        "discriminator_adv_loss_params": {"average_by_discriminators": True},
        "lambda_aux": 1.0, "lambda_adv": 1.0, "lambda_ph": 0.5,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": False,
                             "use_ph_loss": True},
    }
    gen = HiFiGANGenerator(
        in_channels=13, channels=32, kernel_size=7,
        upsample_scales=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        use_ph_loss=True, num_ph=num_ph)
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1,
        scale_discriminator_params={"channels": 8,
                                    "max_downsample_channels": 16,
                                    "max_groups": 2},
        periods=[2],
        period_discriminator_params={"channels": 2,
                                     "max_downsample_channels": 4})

    b, t = 2, 50
    c = jnp.asarray(rng.standard_normal((b, t, 13)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, t * 16, 1)) * 0.1, jnp.float32)
    ph = jnp.asarray(rng.integers(0, num_ph, (b, t)), jnp.int32)

    key = jax.random.PRNGKey(0)
    out, ph_logits = gen.apply(gen.init(key, c), c)
    # ph head pools the wav-rate features back to the frame rate
    assert ph_logits.shape == (b, t, num_ph)

    vg = gen.init(key, c)
    vd = disc.init({"params": key, "window": key}, y)
    tx = build_optimizer("Adam", {"betas": (0.5, 0.9)})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx))
    batch = {"x": (c,), "y": y, "ph": ph}
    s1, m = step(state, batch, jax.random.PRNGKey(1),
                 jnp.float32(1e-4), jnp.float32(1e-4))
    assert np.isfinite(float(m["train/ph_loss"]))
    assert float(m["train/ph_loss"]) > 0
    assert np.isfinite(float(m["train/generator_loss"]))
