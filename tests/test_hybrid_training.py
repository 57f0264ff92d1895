"""Hybrid-precision generator inside the jitted GAN train step.

``generator_params: {compute_dtype: bfloat16, hybrid_precision: true}`` is
the decode-certified mixed-precision configuration (docs/DESIGN.md §7);
this pins the TRAINING path: the generator's bf16-interior forward (and the
gradients flowing back through the casts) compose with the masked-update
GAN step — finite losses, f32 master params, updates applied to every
generator leaf — and the hybrid step tracks an f32 step closely over a few
steps (before chaos; the long-horizon question is answered on hardware by
tools/hybrid_train_quality_ab.sh).
"""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    HiFiGANGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer

GEN_KW = dict(in_channels=13 + 8, channels=32, kernel_size=7,
              upsample_scales=(4, 4), upsample_kernel_sizes=(8, 8),
              resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
              use_ar=True, ar_input=64, ar_hidden=8, ar_output=8)

CONFIG = {
    "dataset_mode": "a2w",
    "batch_max_steps": 800, "hop_size": 16,
    "use_stft_loss": True,
    "stft_loss_params": {"fft_sizes": [128], "hop_sizes": [32],
                         "win_lengths": [64]},
    "use_mel_loss": False, "use_feat_match_loss": True,
    "generator_adv_loss_params": {"average_by_discriminators": True},
    "discriminator_adv_loss_params": {"average_by_discriminators": True},
    "lambda_aux": 1.0, "lambda_adv": 1.0, "lambda_feat_match": 2.0,
    "generator_train_start_steps": 0,
    "discriminator_train_start_steps": 0,
    "generator_params": {"out_channels": 1, "use_ar": True, "ar_input": 64},
}


def _run_steps(gen, rng, n=3):
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
    ar = jnp.asarray(rng.standard_normal((b, 64, 1)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, t * 16, 1)) * 0.1, jnp.float32)

    key = jax.random.PRNGKey(0)
    vg = gen.init(key, c, ar=ar)
    vd = disc.init({"params": key, "window": key}, y)
    tx = build_optimizer("Adam", {"betas": (0.5, 0.9)})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    step = jax.jit(make_train_step(gen, disc, GANCriterion(CONFIG), CONFIG,
                                   tx, tx))
    batch = {"x": (c,), "y": y, "ar": ar}
    metrics = None
    init_params = state.params_g
    for i in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(1 + i),
                              jnp.float32(1e-4), jnp.float32(1e-4))
    return init_params, state, metrics


def test_hybrid_train_step(rng):
    gen = HiFiGANGenerator(**GEN_KW, compute_dtype=jnp.bfloat16,
                           hybrid_precision=True)
    init_g, state, metrics = _run_steps(gen, rng)

    for k in ("train/generator_loss", "train/discriminator_loss",
              "train/spectral_convergence_loss"):
        assert np.isfinite(float(metrics[k])), k

    # master params stay f32 and every generator leaf actually moved
    leaves_before = jax.tree.leaves(init_g)
    leaves_after = jax.tree.leaves(state.params_g)
    for a, b_ in zip(leaves_before, leaves_after):
        assert b_.dtype == jnp.float32
        assert np.abs(np.asarray(a, np.float64)
                      - np.asarray(b_, np.float64)).max() > 0


def test_hybrid_step_tracks_f32_short_horizon(rng):
    """Before chaotic divergence, hybrid training must track f32 training:
    same init, same batches, 3 steps — generator params stay close."""
    gen32 = HiFiGANGenerator(**GEN_KW)
    genhy = HiFiGANGenerator(**GEN_KW, compute_dtype=jnp.bfloat16,
                             hybrid_precision=True)
    _, s32, m32 = _run_steps(gen32, np.random.default_rng(123))
    _, shy, mhy = _run_steps(genhy, np.random.default_rng(123))

    g32 = np.concatenate([np.asarray(x, np.float64).ravel()
                          for x in jax.tree.leaves(s32.params_g)])
    ghy = np.concatenate([np.asarray(x, np.float64).ravel()
                          for x in jax.tree.leaves(shy.params_g)])
    rel = np.linalg.norm(ghy - g32) / (np.linalg.norm(g32) + 1e-12)
    assert rel < 5e-3, rel
    # losses agree to bf16-rounding level
    a = float(m32["train/generator_loss"])
    b = float(mhy["train/generator_loss"])
    assert abs(a - b) / max(abs(a), 1e-9) < 0.05, (a, b)
