"""Full-zoo jax->torch exporters: import -> export -> strict reload parity.

For every family: build a reference model, import its weights into our param
layout, export back to a torch state dict, load it STRICTLY into a second
reference instance, and check the two torch models produce identical
outputs. This pins the exporters as exact inverses of the importers over the
reference's own module structure (weight-norm reparams, flipped ConvT
kernels, folded Conv2d norms, BatchNorm buffers included).
"""

import numpy as np
import pytest

from conftest import requires_reference


def _roundtrip(ref_cls, cfg, importer, exporter, make_inputs, rng,
               atol=1e-6):
    import torch

    torch.manual_seed(0)
    ref = ref_cls(**cfg)
    ref.eval()
    params = importer(ref.state_dict(), cfg)
    mutables = {}
    if isinstance(params, tuple):
        params, mutables = params
    from articulatory_tpu.utils.torch_export import to_torch_state_dict

    sd = to_torch_state_dict(exporter(params, mutables, cfg))
    ref2 = ref_cls(**cfg)
    ref2.load_state_dict(sd, strict=True)
    ref2.eval()
    inputs = make_inputs(rng)
    with torch.no_grad():
        a = ref(*[torch.from_numpy(x) for x in inputs])
        b = ref2(*[torch.from_numpy(x) for x in inputs])

    def flat(o):
        if isinstance(o, (list, tuple)):
            out = []
            for x in o:
                out.extend(flat(x))
            return out
        return [o]

    for x, y in zip(flat(a), flat(b)):
        np.testing.assert_allclose(x.numpy(), y.numpy(), rtol=1e-5, atol=atol)


@requires_reference
def test_melgan_generator_roundtrip(reference, rng):
    from articulatory.models import MelGANGenerator

    from articulatory_tpu.utils.torch_import import import_melgan_generator
    from articulatory_tpu.utils.torch_export import export_melgan_generator

    cfg = dict(in_channels=13, channels=64, upsample_scales=[4, 2], stacks=2)
    _roundtrip(MelGANGenerator, cfg, import_melgan_generator,
               lambda p, m, c: export_melgan_generator(p, c),
               lambda r: [r.standard_normal((2, 13, 20)).astype(np.float32)],
               rng)


@requires_reference
def test_pwg_generator_roundtrip(reference, rng):
    from articulatory.models import ParallelWaveGANGenerator

    from articulatory_tpu.utils.torch_import import import_pwg_generator
    from articulatory_tpu.utils.torch_export import export_pwg_generator

    cfg = dict(layers=4, stacks=2, residual_channels=8, gate_channels=16,
               skip_channels=8, aux_channels=13, aux_context_window=2,
               upsample_params={"upsample_scales": [4, 2]})
    _roundtrip(
        ParallelWaveGANGenerator, cfg, import_pwg_generator,
        lambda p, m, c: export_pwg_generator(p, c),
        lambda r: [r.standard_normal((2, 1, 80)).astype(np.float32),
                   r.standard_normal((2, 13, 14)).astype(np.float32)],
        rng)


@requires_reference
def test_style_melgan_generator_roundtrip(reference, rng):
    from articulatory.models import StyleMelGANGenerator

    from articulatory_tpu.utils.torch_import import (
        import_style_melgan_generator,
    )
    from articulatory_tpu.utils.torch_export import (
        export_style_melgan_generator,
    )

    cfg = dict(in_channels=16, aux_channels=13, channels=16,
               noise_upsample_scales=[2, 2], upsample_scales=[2, 1])
    import torch

    torch.manual_seed(0)
    ref = StyleMelGANGenerator(**cfg)
    ref.eval()
    params = import_style_melgan_generator(ref.state_dict(), cfg)
    from articulatory_tpu.utils.torch_export import to_torch_state_dict

    sd = to_torch_state_dict(export_style_melgan_generator(params, cfg))
    ref2 = StyleMelGANGenerator(**cfg)
    # PQMF filter buffers are deterministic (rebuilt at construction), not
    # exported — allow them to be absent from the state dict
    missing, unexpected = ref2.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all("pqmf" in k for k in missing), missing
    ref2.eval()
    torch.manual_seed(1)
    z = torch.randn(2, 16, 5)
    c = torch.randn(2, 13, 20)  # aux length = noise-upsampled length
    with torch.no_grad():
        a = ref(c, z)
        b = ref2(c, z)
    np.testing.assert_allclose(a.numpy(), b.numpy(), rtol=1e-5, atol=1e-6)


@requires_reference
def test_gblock_generator_roundtrip(reference, rng):
    from articulatory.models import GBlockGenerator

    from articulatory_tpu.utils.torch_import import import_gblock_generator
    from articulatory_tpu.utils.torch_export import export_gblock_generator

    # the reference's fixed channel schedule requires 9-10 blocks
    scales = [2, 2, 1, 1, 1, 1, 1, 1, 1]
    cfg = dict(in_channels=13, channels=16, g_scales=scales,
               g_kernel_sizes=[3] * 9)
    _roundtrip(GBlockGenerator, cfg, import_gblock_generator,
               lambda p, m, c: export_gblock_generator(p, c),
               lambda r: [r.standard_normal((2, 13, 10)).astype(np.float32)],
               rng)


@requires_reference
def test_transformer_roundtrip(reference, rng):
    from articulatory.models import Transformer

    from articulatory_tpu.utils.torch_import import import_transformer
    from articulatory_tpu.utils.torch_export import export_transformer

    import torch

    from articulatory_tpu.utils.torch_export import to_torch_state_dict

    cfg = dict(in_channels=13, out_channels=12, hidden_dim=16, elayers=2)
    torch.manual_seed(0)
    ref = Transformer(**cfg)
    ref.eval()
    params, mutables = import_transformer(ref.state_dict(), cfg)
    sd = to_torch_state_dict(export_transformer(params, mutables, cfg))
    ref2 = Transformer(**cfg)
    ref2.load_state_dict(sd, strict=True)
    # import/export is lossless for the transformer: every tensor round-trips
    # bit-exactly (forward comparison is impossible here — the reference's
    # custom MHA breaks under this torch version's nn.TransformerEncoder)
    for k, v in ref.state_dict().items():
        np.testing.assert_array_equal(v.numpy(), ref2.state_dict()[k].numpy(),
                                      err_msg=k)


@requires_reference
def test_melgan_msd_roundtrip(reference, rng):
    from articulatory.models import MelGANMultiScaleDiscriminator

    from articulatory_tpu.utils.torch_import import import_melgan_msd
    from articulatory_tpu.utils.torch_export import export_melgan_msd

    cfg = dict(scales=2, channels=8, max_downsample_channels=32,
               downsample_scales=[4, 4])
    _roundtrip(MelGANMultiScaleDiscriminator, cfg, import_melgan_msd,
               lambda p, m, c: export_melgan_msd(p, c),
               lambda r: [r.standard_normal((2, 1, 1024)).astype(np.float32)],
               rng)


@requires_reference
def test_pwg_discriminator_roundtrip(reference, rng):
    from articulatory.models import ParallelWaveGANDiscriminator

    from articulatory_tpu.utils.torch_import import import_pwg_discriminator
    from articulatory_tpu.utils.torch_export import export_pwg_discriminator

    cfg = dict(layers=4, conv_channels=8)
    _roundtrip(ParallelWaveGANDiscriminator, cfg, import_pwg_discriminator,
               lambda p, m, c: export_pwg_discriminator(p, c),
               lambda r: [r.standard_normal((2, 1, 512)).astype(np.float32)],
               rng)
