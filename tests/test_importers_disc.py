"""Discriminator checkpoint importers vs the reference oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference


def _to_nlc(x):
    return np.transpose(x, (0, 2, 1))


@requires_reference
def test_melgan_msd_import_parity(reference, rng):
    import torch
    from articulatory.models import MelGANMultiScaleDiscriminator as Ref

    from articulatory_tpu.models import MelGANMultiScaleDiscriminator
    from articulatory_tpu.utils.torch_import import import_melgan_msd

    cfg = dict(scales=2, channels=8, max_downsample_channels=32,
               downsample_scales=[4, 4])
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params = import_melgan_msd(ref.state_dict(), cfg)
    ours = MelGANMultiScaleDiscriminator(scales=2, channels=8,
                                         max_downsample_channels=32,
                                         downsample_scales=(4, 4))
    x = rng.standard_normal((2, 1, 1024)).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    outs = ours.apply({"params": params}, jnp.asarray(_to_nlc(x)))
    assert len(outs) == len(outs_ref)
    for fo, fr in zip(outs, outs_ref):
        assert len(fo) == len(fr)
        for a, b in zip(fo, fr):
            np.testing.assert_allclose(np.transpose(np.asarray(a), (0, 2, 1)),
                                       b.numpy(), rtol=1e-3, atol=1e-4)


@requires_reference
def test_pwg_discriminator_import_parity(reference, rng):
    import torch
    from articulatory.models import ParallelWaveGANDiscriminator as Ref

    from articulatory_tpu.models import ParallelWaveGANDiscriminator
    from articulatory_tpu.utils.torch_import import import_pwg_discriminator

    cfg = dict(layers=4, conv_channels=8)
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params = import_pwg_discriminator(ref.state_dict(), cfg)
    ours = ParallelWaveGANDiscriminator(layers=4, conv_channels=8)
    x = rng.standard_normal((2, 1, 512)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(_to_nlc(x))))
    np.testing.assert_allclose(np.transpose(y, (0, 2, 1)), y_ref,
                               rtol=1e-3, atol=1e-4)


@requires_reference
def test_style_melgan_discriminator_import_parity(reference, rng):
    import torch
    from articulatory.models import StyleMelGANDiscriminator as Ref

    from articulatory_tpu.models import StyleMelGANDiscriminator
    from articulatory_tpu.utils.torch_import import (
        import_style_melgan_discriminator,
    )

    d_params = {"out_channels": 1, "kernel_sizes": [5, 3], "channels": 8,
                "max_downsample_channels": 32, "bias": True,
                "downsample_scales": [2, 1],
                "nonlinear_activation": "LeakyReLU",
                "nonlinear_activation_params": {"negative_slope": 0.2},
                "pad": "ReflectionPad1d", "pad_params": {}}
    cfg = dict(repeats=1, window_sizes=[128, 256],
               pqmf_params=[[1, None, None, None], [2, 62, 0.267, 9.0]],
               discriminator_params=d_params)
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params = import_style_melgan_discriminator(ref.state_dict(), cfg)
    ours = StyleMelGANDiscriminator(
        repeats=1, window_sizes=(128, 256),
        pqmf_params=((1, None, None, None), (2, 62, 0.267, 9.0)),
        discriminator_params=d_params)

    x = rng.standard_normal((2, 1, 1024)).astype(np.float32)
    # fix the random windows on both sides: start = 0 for every sub-disc
    np.random.seed(0)
    with torch.no_grad():
        # monkeypatch np.random.randint used by the reference to start=0
        import articulatory.models.style_melgan as ref_mod

        orig = ref_mod.np.random.randint
        ref_mod.np.random.randint = lambda hi: 0
        try:
            outs_ref = ref(torch.from_numpy(x))
        finally:
            ref_mod.np.random.randint = orig

    # our side: window rng replaced by zeros via a fixed key is harder; call
    # the sub-discriminators directly at start=0 through bound modules
    from articulatory_tpu.ops.pqmf import PQMF

    xo = jnp.asarray(_to_nlc(x))
    sub0 = xo[:, :128, :]
    sub1 = PQMF(subbands=2, taps=62, cutoff_ratio=0.267,
                beta=9.0).analysis(xo[:, :256, :])
    from articulatory_tpu.models import MelGANDiscriminator

    outs_ours = []
    for idx, inp in enumerate((sub0, sub1)):
        d = dict(d_params)
        d["in_channels"] = 1 if idx == 0 else 2
        disc = MelGANDiscriminator(**d)
        outs_ours.append(disc.apply({"params": params[f"disc_{idx}"]}, inp))

    for fo, fr in zip(outs_ours, outs_ref):
        for a, b in zip(fo, fr):
            np.testing.assert_allclose(np.transpose(np.asarray(a), (0, 2, 1)),
                                       b.numpy(), rtol=1e-3, atol=1e-4)
