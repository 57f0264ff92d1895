"""ParallelWaveGAN training: noise+aux generator with the legacy collater
batch layout (x = (noise, aux)) and the residual PWG discriminator."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.data.collate import Collater
from articulatory_tpu.models import (
    ParallelWaveGANDiscriminator,
    ParallelWaveGANGenerator,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def test_pwg_train_step_with_legacy_collater(rng):
    hop = 80
    config = {
        "dataset_mode": "default",
        "batch_max_steps": 800, "hop_size": hop,
        "use_stft_loss": True,
        "stft_loss_params": {"fft_sizes": [256], "hop_sizes": [64],
                             "win_lengths": [128]},
        "use_mel_loss": False, "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": True},
        "discriminator_adv_loss_params": {"average_by_discriminators": True},
        "lambda_aux": 1.0, "lambda_adv": 4.0,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": False},
    }
    aux_cw = 2
    gen = ParallelWaveGANGenerator(layers=4, stacks=2, residual_channels=8,
                                   gate_channels=16, skip_channels=8,
                                   aux_channels=20, aux_context_window=aux_cw,
                                   upsample_params={"upsample_scales": [8, 10]})
    disc = ParallelWaveGANDiscriminator(layers=3, conv_channels=8)

    # legacy collater: items are (audio, mel) tuples; noise input enabled
    items = []
    for i in range(3):
        t = 4000 + 400 * i
        items.append((rng.standard_normal(t).astype(np.float32) * 0.1,
                      rng.standard_normal((t // hop, 20)).astype(np.float32)))
    collater = Collater(batch_max_steps=800, hop_size=hop,
                        aux_context_window=aux_cw, use_noise_input=True,
                        rng=rng)
    batch = collater(items)
    assert batch["x"][0].shape == (3, 800, 1)           # noise
    assert batch["x"][1].shape == (3, 10 + 2 * aux_cw, 20)  # aux + context

    b = {"x": tuple(jnp.asarray(v) for v in batch["x"]),
         "y": jnp.asarray(batch["y"])}
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, b["x"][0], b["x"][1])
    vd = disc.init(key, b["y"])
    tx = build_optimizer("RAdam", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx))
    s1, m = step(state, b, jax.random.PRNGKey(1),
                 jnp.float32(1e-4), jnp.float32(1e-4))
    assert np.isfinite(float(m["train/generator_loss"]))
    assert np.isfinite(float(m["train/spectral_convergence_loss"]))
    assert np.isfinite(float(m["train/discriminator_loss"]))
