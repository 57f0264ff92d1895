"""Loss parity tests vs the reference implementations."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from articulatory_tpu.losses import (
    DiscriminatorAdversarialLoss,
    FeatureMatchLoss,
    GeneratorAdversarialLoss,
    MelSpectrogramLoss,
    MultiResolutionSTFTLoss,
)

from conftest import requires_reference


@requires_reference
def test_mr_stft_loss_matches_reference(reference, rng):
    from articulatory.losses import MultiResolutionSTFTLoss as RefLoss

    x = rng.standard_normal((2, 8000)).astype(np.float32)
    y = rng.standard_normal((2, 8000)).astype(np.float32)
    ref = RefLoss()
    with torch.no_grad():
        sc_ref, mag_ref = ref(torch.from_numpy(x), torch.from_numpy(y))
    ours = MultiResolutionSTFTLoss()
    sc, mag = ours(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(sc), float(sc_ref), rtol=1e-4)
    np.testing.assert_allclose(float(mag), float(mag_ref), rtol=1e-4)


@requires_reference
def test_mel_loss_matches_reference(reference, rng):
    # The reference MelSpectrogramLoss imports librosa at module load; this
    # environment lacks librosa, so compare against a torch-built equivalent
    # using our own mel matrix (mel matrix itself is validated separately).
    from articulatory_tpu.ops.mel import mel_filterbank

    x = rng.standard_normal((2, 8000)).astype(np.float32)
    y = rng.standard_normal((2, 8000)).astype(np.float32)

    melmat = torch.from_numpy(mel_filterbank(16000, 1024, 80, 0, 8000))

    def ref_mel(w):
        z = torch.stft(torch.from_numpy(w), 1024, 80, 1024,
                       torch.hann_window(1024), return_complex=True)
        amp = torch.sqrt(torch.clamp(z.abs() ** 2, min=1e-10)).transpose(1, 2)
        mel = torch.clamp(torch.matmul(amp, melmat.T), min=1e-10)
        return torch.log10(mel)

    ref_val = torch.nn.functional.l1_loss(ref_mel(x), ref_mel(y)).item()
    ours = MelSpectrogramLoss(fs=16000, fft_size=1024, hop_size=80,
                              num_mels=80, fmin=0, fmax=8000)
    val = float(ours(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(val, ref_val, rtol=1e-4)


@requires_reference
def test_adversarial_losses_match_reference(reference, rng):
    from articulatory.losses import (
        DiscriminatorAdversarialLoss as RefDisc,
        GeneratorAdversarialLoss as RefGen,
    )

    outs_hat = [[rng.standard_normal((2, 5)).astype(np.float32) for _ in range(3)]
                for _ in range(4)]
    outs = [[rng.standard_normal((2, 5)).astype(np.float32) for _ in range(3)]
            for _ in range(4)]

    for avg in (True, False):
        for lt in ("mse", "hinge"):
            rg = RefGen(average_by_discriminators=avg, loss_type=lt)
            ref_val = rg([[torch.from_numpy(t) for t in d] for d in outs_hat]).item()
            og = GeneratorAdversarialLoss(average_by_discriminators=avg, loss_type=lt)
            val = float(og([[jnp.asarray(t) for t in d] for d in outs_hat]))
            np.testing.assert_allclose(val, ref_val, rtol=1e-5)

            rd = RefDisc(average_by_discriminators=avg, loss_type=lt)
            rr, rf = rd([[torch.from_numpy(t) for t in d] for d in outs_hat],
                        [[torch.from_numpy(t) for t in d] for d in outs])
            od = DiscriminatorAdversarialLoss(average_by_discriminators=avg, loss_type=lt)
            r, f = od([[jnp.asarray(t) for t in d] for d in outs_hat],
                      [[jnp.asarray(t) for t in d] for d in outs])
            np.testing.assert_allclose(float(r), rr.item(), rtol=1e-5)
            np.testing.assert_allclose(float(f), rf.item(), rtol=1e-5)


@requires_reference
def test_feat_match_loss_matches_reference(reference, rng):
    from articulatory.losses import FeatureMatchLoss as RefFM

    feats_hat = [[rng.standard_normal((2, 7, 3)).astype(np.float32) for _ in range(4)]
                 for _ in range(3)]
    feats = [[rng.standard_normal((2, 7, 3)).astype(np.float32) for _ in range(4)]
             for _ in range(3)]
    for al in (True, False):
        for ad in (True, False):
            for inc in (True, False):
                ref = RefFM(average_by_layers=al, average_by_discriminators=ad,
                            include_final_outputs=inc)
                ref_val = ref([[torch.from_numpy(t) for t in d] for d in feats_hat],
                              [[torch.from_numpy(t) for t in d] for d in feats]).item()
                ours = FeatureMatchLoss(average_by_layers=al,
                                        average_by_discriminators=ad,
                                        include_final_outputs=inc)
                val = float(ours([[jnp.asarray(t) for t in d] for d in feats_hat],
                                 [[jnp.asarray(t) for t in d] for d in feats]))
                np.testing.assert_allclose(val, ref_val, rtol=1e-5)
