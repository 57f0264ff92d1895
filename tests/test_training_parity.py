"""Capstone training parity: our jitted GAN step vs a torch re-enactment of
the reference's _train_step (reference bin/train.py:241-440) using the
REFERENCE's models and loss modules, from identical imported weights, on
identical batches, with identical Adam hyperparameters.

Loss trajectories and parameters must track for several steps — this pins
down the full training semantics (loss weighting, fake regeneration under
no-grad, optimizer math) end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

GEN_CFG = dict(in_channels=13 + 8, out_channels=1, channels=16, kernel_size=7,
               upsample_scales=[5, 4, 2, 2], upsample_kernel_sizes=[10, 8, 4, 4],
               resblock_kernel_sizes=[3], resblock_dilations=[[1, 3]],
               use_ar=True, ar_input=64, ar_hidden=8, ar_output=8)
DISC_CFG = dict(
    scales=2,
    scale_discriminator_params={"channels": 16, "max_downsample_channels": 32,
                                "max_groups": 4,
                                "downsample_scales": [2, 2, 4, 4, 1]},
    periods=[2, 3],
    period_discriminator_params={"channels": 4, "max_downsample_channels": 16,
                                 "downsample_scales": [3, 3, 3, 3, 1]},
    follow_official_norm=False)

MEL_CFG = dict(fs=16000, fft_size=256, hop_size=80, win_length=None,
               window="hann", num_mels=20, fmin=0, fmax=8000, log_base=None)

N_STEPS = 4
LR = 1e-4
LAMBDA_AUX, LAMBDA_ADV, LAMBDA_FM = 45.0, 1.0, 2.0


def _torch_reenactment(reference, batches):
    """Reference models + losses, stepped with the reference's exact order."""
    import torch
    from articulatory.losses import (
        DiscriminatorAdversarialLoss,
        FeatureMatchLoss,
        GeneratorAdversarialLoss,
        MelSpectrogramLoss,
    )
    from articulatory.models import (
        HiFiGANGenerator,
        HiFiGANMultiScaleMultiPeriodDiscriminator,
    )

    torch.manual_seed(0)
    gen = HiFiGANGenerator(**GEN_CFG)
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(**DISC_CFG)
    gen.train()
    disc.train()
    crit_mel = MelSpectrogramLoss(**MEL_CFG)
    crit_gadv = GeneratorAdversarialLoss(average_by_discriminators=False)
    crit_dadv = DiscriminatorAdversarialLoss(average_by_discriminators=False)
    crit_fm = FeatureMatchLoss(average_by_discriminators=False,
                               average_by_layers=False)
    opt_g = torch.optim.Adam(gen.parameters(), lr=LR, betas=(0.5, 0.9))
    opt_d = torch.optim.Adam(disc.parameters(), lr=LR, betas=(0.5, 0.9))

    logs = []
    for x, y, ar in batches:
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)).copy())
        yt = torch.from_numpy(np.transpose(y, (0, 2, 1)).copy())
        art = torch.from_numpy(np.transpose(ar, (0, 2, 1)).copy())
        # generator step (reference train.py:268-383)
        y_ = gen(xt, ar=art)
        mel_l = crit_mel(y_, yt)
        gen_loss = mel_l * LAMBDA_AUX
        disc_y = torch.cat([art, yt], dim=2)
        disc_y_ = torch.cat([art, y_], dim=2)
        p_ = disc(disc_y_)
        adv = crit_gadv(p_)
        with torch.no_grad():
            p = disc(disc_y)
        fm = crit_fm(p_, p)
        gen_loss = gen_loss + LAMBDA_ADV * (adv + LAMBDA_FM * fm)
        opt_g.zero_grad()
        gen_loss.backward()
        opt_g.step()
        # discriminator step with regenerated fake (train.py:385-435)
        with torch.no_grad():
            y2_ = gen(xt, ar=art)
        disc_y2_ = torch.cat([art, y2_], dim=2)
        p = disc(disc_y)
        p_ = disc(disc_y2_.detach())
        real_l, fake_l = crit_dadv(p_, p)
        dis_loss = real_l + fake_l
        opt_d.zero_grad()
        dis_loss.backward()
        opt_d.step()
        logs.append((float(gen_loss), float(mel_l), float(dis_loss)))
    return gen, disc, logs


@requires_reference
def test_training_trajectory_matches_reference(reference, rng):
    import torch

    from articulatory_tpu.models import (
        HiFiGANGenerator,
        HiFiGANMultiScaleMultiPeriodDiscriminator,
    )
    from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
    from articulatory_tpu.train.optimizers import build_optimizer
    from articulatory_tpu.utils.torch_import import (
        import_hifigan_generator,
        import_hifigan_msmpd,
    )

    B = 2
    batches = []
    for _ in range(N_STEPS):
        x = rng.standard_normal((B, 10, 13)).astype(np.float32)
        y = (rng.standard_normal((B, 800, 1)) * 0.1).astype(np.float32)
        ar = (rng.standard_normal((B, 64, 1)) * 0.1).astype(np.float32)
        batches.append((x, y, ar))

    ref_gen, ref_disc, ref_logs = _torch_reenactment(reference, batches)

    # our side: same weights (imported BEFORE torch training mutates them)
    import torch as _t

    _t.manual_seed(0)
    from articulatory.models import (
        HiFiGANGenerator as RefGen,
        HiFiGANMultiScaleMultiPeriodDiscriminator as RefDisc,
    )

    src_gen = RefGen(**GEN_CFG)
    src_disc = RefDisc(**DISC_CFG)
    params_g = import_hifigan_generator(src_gen.state_dict(), GEN_CFG)
    params_d = import_hifigan_msmpd(src_disc.state_dict(), DISC_CFG)

    config = {
        "dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": MEL_CFG, "use_feat_match_loss": True,
        "feat_match_loss_params": {"average_by_discriminators": False,
                                   "average_by_layers": False},
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": LAMBDA_AUX, "lambda_adv": LAMBDA_ADV,
        "lambda_feat_match": LAMBDA_FM,
        "generator_train_start_steps": 0, "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": True, "ar_input": 64},
    }
    gen = HiFiGANGenerator(**{**GEN_CFG,
                              "upsample_scales": tuple(GEN_CFG["upsample_scales"]),
                              "upsample_kernel_sizes": tuple(GEN_CFG["upsample_kernel_sizes"]),
                              "resblock_kernel_sizes": (3,),
                              "resblock_dilations": ((1, 3),)})
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(**DISC_CFG)
    tx = build_optimizer("Adam", {"betas": [0.5, 0.9]})
    state = GANTrainState(params_g=params_g, params_d=params_d,
                          opt_g=tx.init(params_g), opt_d=tx.init(params_d),
                          steps=jnp.asarray(1, jnp.int32))
    crit = GANCriterion(config)
    step = jax.jit(make_train_step(gen, disc, crit, config, tx, tx))

    lr = jnp.float32(LR)
    our_logs = []
    for x, y, ar in batches:
        batch = {"x": (jnp.asarray(x),), "y": jnp.asarray(y),
                 "ar": jnp.asarray(ar)}
        state, m = step(state, batch, jax.random.PRNGKey(0), lr, lr)
        our_logs.append((float(m["train/generator_loss"]),
                         float(m["train/mel_loss"]),
                         float(m["train/discriminator_loss"])))

    for i, (ref_log, our_log) in enumerate(zip(ref_logs, our_logs)):
        for name, a, b in zip(("gen", "mel", "disc"), ref_log, our_log):
            np.testing.assert_allclose(
                b, a, rtol=2e-3,
                err_msg=f"step {i} {name}: ours {b} vs reference {a}")

    # final generator params also track
    final_ref = import_hifigan_generator(ref_gen.state_dict(), GEN_CFG)
    ours_leaves = jax.tree.leaves(jax.device_get(state.params_g))
    ref_leaves = jax.tree.leaves(final_ref)
    worst = max(float(np.abs(a - b).max())
                for a, b in zip(ours_leaves, ref_leaves))
    assert worst < 5e-4, f"final generator params diverged: {worst}"
