"""use_remat: identical results, activations rematerialized."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    HiFiGANGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def test_remat_matches_plain(rng):
    config = {
        "dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 256, "hop_size": 80,
                            "num_mels": 20, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0,
        "generator_train_start_steps": 0, "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": False},
    }
    gen = HiFiGANGenerator(in_channels=13, channels=16,
                           upsample_scales=(5, 4, 2, 2),
                           upsample_kernel_sizes=(10, 8, 4, 4),
                           resblock_kernel_sizes=(3,), resblock_dilations=((1,),))
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1, scale_discriminator_params={"channels": 8,
                                              "max_downsample_channels": 16,
                                              "max_groups": 2},
        periods=[2], period_discriminator_params={"channels": 2,
                                                  "max_downsample_channels": 4})
    B = 2
    batch = {"x": (jnp.asarray(rng.standard_normal((B, 10, 13)), jnp.float32),),
             "y": jnp.asarray(rng.standard_normal((B, 800, 1)) * 0.1, jnp.float32)}
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, batch["x"][0])
    vd = disc.init({"params": key, "window": key}, batch["y"])
    tx = build_optimizer("SGD", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    crit = GANCriterion(config)
    lr = jnp.float32(1e-3)

    step_plain = jax.jit(make_train_step(gen, disc, crit, config, tx, tx))
    s_plain, m_plain = step_plain(state, batch, jax.random.PRNGKey(1), lr, lr)

    config_r = dict(config, use_remat=True)
    step_remat = jax.jit(make_train_step(gen, disc, GANCriterion(config_r),
                                         config_r, tx, tx))
    s_remat, m_remat = step_remat(state, batch, jax.random.PRNGKey(1), lr, lr)

    np.testing.assert_allclose(float(m_plain["train/generator_loss"]),
                               float(m_remat["train/generator_loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_plain.params_g),
                    jax.tree.leaves(s_remat.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
