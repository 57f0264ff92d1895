"""Weight-import parity for the full generator zoo vs the reference oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference


def _to_nlc(x):  # torch (B, C, T) -> ours (B, T, C)
    return np.transpose(x, (0, 2, 1))


@requires_reference
def test_melgan_import_parity(reference, rng):
    import torch
    from articulatory.models import MelGANGenerator as Ref

    from articulatory_tpu.models import MelGANGenerator
    from articulatory_tpu.utils.torch_import import import_melgan_generator

    cfg = dict(in_channels=13, channels=64, upsample_scales=[4, 2], stacks=2)
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params = import_melgan_generator(ref.state_dict(), cfg)
    ours = MelGANGenerator(in_channels=13, channels=64,
                           upsample_scales=(4, 2), stacks=2)
    c = rng.standard_normal((2, 13, 20)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c)).numpy()
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(_to_nlc(c))))
    np.testing.assert_allclose(np.transpose(y, (0, 2, 1)), y_ref,
                               rtol=1e-3, atol=1e-4)


@requires_reference
def test_pwg_import_parity(reference, rng):
    import torch
    from articulatory.models import ParallelWaveGANGenerator as Ref

    from articulatory_tpu.models import ParallelWaveGANGenerator
    from articulatory_tpu.utils.torch_import import import_pwg_generator

    cfg = dict(layers=4, stacks=2, residual_channels=8, gate_channels=16,
               skip_channels=8, aux_channels=13, aux_context_window=2,
               upsample_params={"upsample_scales": [4, 2]})
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params = import_pwg_generator(ref.state_dict(), cfg)
    ours = ParallelWaveGANGenerator(**{**cfg, "upsample_params":
                                       {"upsample_scales": [4, 2]}})
    t_feats, up = 10, 8
    c = rng.standard_normal((2, 13, t_feats + 4)).astype(np.float32)
    z = rng.standard_normal((2, 1, t_feats * up)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(z), torch.from_numpy(c)).numpy()
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(_to_nlc(z)),
                              jnp.asarray(_to_nlc(c))))
    np.testing.assert_allclose(np.transpose(y, (0, 2, 1)), y_ref,
                               rtol=1e-3, atol=1e-4)


@requires_reference
def test_style_melgan_import_parity(reference, rng):
    import torch
    from articulatory.models import StyleMelGANGenerator as Ref

    from articulatory_tpu.models import StyleMelGANGenerator
    from articulatory_tpu.utils.torch_import import import_style_melgan_generator

    cfg = dict(in_channels=16, aux_channels=13, channels=16,
               noise_upsample_scales=[2, 2], upsample_scales=[2, 1])
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params = import_style_melgan_generator(ref.state_dict(), cfg)
    ours = StyleMelGANGenerator(in_channels=16, aux_channels=13, channels=16,
                                noise_upsample_scales=(2, 2),
                                upsample_scales=(2, 1))
    # fixed noise; aux length matched to noise-upsampled length (5 * 4 = 20)
    z = rng.standard_normal((2, 16, 5)).astype(np.float32)
    c = rng.standard_normal((2, 13, 20)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c), torch.from_numpy(z)).numpy()
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(_to_nlc(c)),
                              jnp.asarray(_to_nlc(z))))
    np.testing.assert_allclose(np.transpose(y, (0, 2, 1)), y_ref,
                               rtol=1e-3, atol=1e-4)


@requires_reference
def test_gblock_import_parity(reference, rng):
    import torch
    from articulatory.models import GBlockGenerator as Ref

    from articulatory_tpu.models import GBlockGenerator
    from articulatory_tpu.utils.torch_import import import_gblock_generator

    # the reference's fixed channel schedule requires 9-10 blocks
    # (gblock_gen.py:63-69 + output_conv channels//8)
    scales = [2, 2, 1, 1, 1, 1, 1, 1, 1]
    ksizes = [3] * 9
    cfg = dict(in_channels=13, channels=16, g_scales=scales,
               g_kernel_sizes=ksizes)
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params = import_gblock_generator(ref.state_dict(), cfg)
    ours = GBlockGenerator(in_channels=13, channels=16, g_scales=tuple(scales),
                           g_kernel_sizes=tuple(ksizes))
    c = rng.standard_normal((2, 13, 10)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c)).numpy()
    y = np.asarray(ours.apply({"params": params}, jnp.asarray(_to_nlc(c))))
    np.testing.assert_allclose(np.transpose(y, (0, 2, 1)), y_ref,
                               rtol=1e-3, atol=1e-4)


@requires_reference
def test_bigru_import_parity(reference, rng):
    import torch
    from articulatory.models import BiGRU as Ref

    from articulatory_tpu.models import BiGRU
    from articulatory_tpu.utils.torch_import import import_bigru

    # in_channels includes ar_output (reference convention: gru input dim)
    cfg = dict(in_channels=13, hidden_size=16, out_channels=4, use_ar=True,
               ar_input=32, ar_hidden=8, ar_output=8)
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params, variables = import_bigru(ref.state_dict(), cfg)
    ours = BiGRU(in_channels=13, hidden_size=16, out_channels=4,
                 use_ar=True, ar_input=32, ar_hidden=8, ar_output=8)
    c = rng.standard_normal((2, 13 - 8, 15)).astype(np.float32)
    ar = rng.standard_normal((2, 4, 8)).astype(np.float32)  # (B, C_out, P)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c), ar=torch.from_numpy(ar)).numpy()
    y = np.asarray(ours.apply({"params": params, **variables},
                              jnp.asarray(_to_nlc(c)),
                              ar=jnp.asarray(_to_nlc(ar))))
    np.testing.assert_allclose(np.transpose(y, (0, 2, 1)), y_ref,
                               rtol=1e-3, atol=1e-4)


@requires_reference
def test_transformer_import_parity(reference, rng):
    import torch
    from articulatory.models import Transformer as Ref

    from articulatory_tpu.models import Transformer
    from articulatory_tpu.utils.torch_import import import_transformer

    cfg = dict(in_channels=13, out_channels=8, elayers=2, hidden_dim=32,
               dropout=0.0)
    torch.manual_seed(0)
    ref = Ref(**cfg)
    ref.eval()
    params, variables = import_transformer(ref.state_dict(), cfg)
    ours = Transformer(in_channels=13, out_channels=8, elayers=2,
                       hidden_dim=32, dropout=0.0)
    c = rng.standard_normal((2, 13, 30)).astype(np.float32)
    with torch.no_grad():
        # replicate reference forward but loop the layers directly (newer
        # torch's nn.TransformerEncoder passes kwargs the reference's custom
        # layer does not accept)
        x = ref.conv_blocks(torch.from_numpy(c))
        x = x.transpose(1, 2)
        x = ref.w_raw_in(x)
        x = x.transpose(0, 1)
        for layer in ref.transformer.layers:
            x = layer(x)
        x = x.transpose(0, 1)
        y_ref = ref.w_out(x).transpose(1, 2).numpy()
    y = np.asarray(ours.apply({"params": params, **variables},
                              jnp.asarray(_to_nlc(c))))
    np.testing.assert_allclose(np.transpose(y, (0, 2, 1)), y_ref,
                               rtol=1e-3, atol=2e-4)
