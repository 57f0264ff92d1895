"""Extra mode coverage: ph2a (phoneme-embedding inputs) and PCD
(pitch-conditioned discriminator) train steps."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    HiFiGANGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
    ParallelWaveGANDiscriminator,
    Transformer,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def test_ph2a_train_step(rng):
    """ph -> articulatory trajectories with a Transformer generator."""
    config = {
        "dataset_mode": "ph2a",
        "batch_max_steps": 800, "hop_size": 80,
        "use_stft_loss": False, "use_mel_loss": True,  # L1 on features
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 1.0, "lambda_adv": 0.1,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 12, "use_ar": False},
    }
    gen = Transformer(in_channels=8, out_channels=12, elayers=1, hidden_dim=32,
                      dropout=0.0, num_ph=40, ph_emb_size=8)
    disc = ParallelWaveGANDiscriminator(in_channels=12, layers=3,
                                        conv_channels=8)
    B, T = 2, 20
    ph = jnp.asarray(rng.integers(0, 40, size=(B, T)), jnp.int32)
    y = jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32)
    batch = {"x": (ph,), "y": y}

    key = jax.random.PRNGKey(0)
    vg = gen.init(key, ph)
    vd = disc.init(key, y)
    tx = build_optimizer("Adam", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32),
                          mutables_g={k: v for k, v in vg.items()
                                      if k != "params"})
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx))
    s1, m = step(state, batch, jax.random.PRNGKey(1),
                 jnp.float32(1e-3), jnp.float32(1e-3))
    assert np.isfinite(float(m["train/generator_loss"]))
    assert np.isfinite(float(m["train/discriminator_loss"]))


def test_pcd_train_step(rng):
    """use_pcd: pitch+periodicity concatenated onto discriminator inputs
    (reference train.py:334-338)."""
    config = {
        "dataset_mode": "a2w",
        "batch_max_steps": 800, "hop_size": 80, "use_pcd": True,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 256, "hop_size": 80,
                            "num_mels": 20, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": False},
    }
    gen = HiFiGANGenerator(in_channels=13, channels=16,
                           upsample_scales=(5, 4, 2, 2),
                           upsample_kernel_sizes=(10, 8, 4, 4),
                           resblock_kernel_sizes=(3,), resblock_dilations=((1,),))
    # discriminator sees wave + pitch + periodicity channels
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1,
        scale_discriminator_params={"in_channels": 3, "channels": 8,
                                    "max_downsample_channels": 16,
                                    "max_groups": 2},
        periods=[2],
        period_discriminator_params={"in_channels": 3, "channels": 2,
                                     "max_downsample_channels": 4})
    B = 2
    batch = {
        "x": (jnp.asarray(rng.standard_normal((B, 10, 13)), jnp.float32),),
        "y": jnp.asarray(rng.standard_normal((B, 800, 1)) * 0.1, jnp.float32),
        "pitch": jnp.asarray(rng.standard_normal((B, 10, 1)), jnp.float32),
        "periodicity": jnp.asarray(rng.standard_normal((B, 10, 1)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, batch["x"][0])
    vd = disc.init({"params": key, "window": key},
                   jnp.zeros((B, 800, 3), jnp.float32))
    tx = build_optimizer("Adam", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx))
    s1, m = step(state, batch, jax.random.PRNGKey(1),
                 jnp.float32(1e-4), jnp.float32(1e-4))
    assert np.isfinite(float(m["train/generator_loss"]))
    assert np.isfinite(float(m["train/discriminator_loss"]))
