"""Shape/grad smoke tests for the full model zoo (small configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    BiGRU,
    GBlockGenerator,
    MelGANGenerator,
    MelGANMultiScaleDiscriminator,
    ParallelWaveGANDiscriminator,
    ParallelWaveGANGenerator,
    ResidualParallelWaveGANDiscriminator,
    StyleMelGANDiscriminator,
    StyleMelGANGenerator,
    Transformer,
    build_model,
)


def test_melgan_generator(rng):
    m = MelGANGenerator(in_channels=13, channels=64, upsample_scales=(4, 2))
    c = jnp.asarray(rng.standard_normal((2, 10, 13)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), c)
    y = m.apply(v, c)
    assert y.shape == (2, 80, 1)


def test_melgan_causal_generator(rng):
    m = MelGANGenerator(in_channels=13, channels=64, upsample_scales=(4, 2),
                        use_causal_conv=True)
    c = jnp.asarray(rng.standard_normal((2, 10, 13)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), c)
    y = m.apply(v, c)
    assert y.shape == (2, 80, 1)


def test_melgan_msd(rng):
    d = MelGANMultiScaleDiscriminator(channels=8, max_downsample_channels=32)
    x = jnp.asarray(rng.standard_normal((2, 1024, 1)), jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x)
    outs = d.apply(v, x)
    assert len(outs) == 3
    assert all(len(o) == 7 for o in outs)


def test_pwg_generator(rng):
    m = ParallelWaveGANGenerator(layers=6, stacks=3, residual_channels=8,
                                 gate_channels=16, skip_channels=8,
                                 aux_channels=13, aux_context_window=2,
                                 upsample_params={"upsample_scales": [4, 2]})
    t_feats, up = 12, 8
    c = jnp.asarray(rng.standard_normal((2, t_feats + 4, 13)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, t_feats * up, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, c)
    y = m.apply(v, x, c)
    assert y.shape == (2, t_feats * up, 1)


def test_pwg_discriminators(rng):
    x = jnp.asarray(rng.standard_normal((2, 512, 1)), jnp.float32)
    d1 = ParallelWaveGANDiscriminator(layers=4, conv_channels=8)
    v1 = d1.init(jax.random.PRNGKey(0), x)
    assert d1.apply(v1, x).shape == (2, 512, 1)
    d2 = ResidualParallelWaveGANDiscriminator(layers=6, stacks=3,
                                              residual_channels=8,
                                              gate_channels=16, skip_channels=8)
    v2 = d2.init(jax.random.PRNGKey(0), x)
    assert d2.apply(v2, x).shape == (2, 512, 1)


def test_style_melgan_generator(rng):
    m = StyleMelGANGenerator(in_channels=32, aux_channels=13, channels=16,
                             noise_upsample_scales=(2, 2),
                             upsample_scales=(2, 2, 1))
    # aux length must match noise-upsampled length: noise frames 5 * 4 = 20
    c = jnp.asarray(rng.standard_normal((2, 20, 13)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), c, z)
    y = m.apply(v, c, z)
    assert y.shape == (2, 20 * 4, 1)


def test_style_melgan_discriminator(rng):
    d = StyleMelGANDiscriminator(
        repeats=2, window_sizes=(64, 128),
        pqmf_params=((1, None, None, None), (2, 62, 0.267, 9.0)),
        discriminator_params={"out_channels": 1, "kernel_sizes": [5, 3],
                              "channels": 8, "max_downsample_channels": 32,
                              "bias": True, "downsample_scales": [2, 1],
                              "nonlinear_activation": "LeakyReLU",
                              "nonlinear_activation_params": {"negative_slope": 0.2},
                              "pad": "ReflectionPad1d", "pad_params": {}})
    x = jnp.asarray(rng.standard_normal((2, 1024, 1)), jnp.float32)
    v = d.init({"params": jax.random.PRNGKey(0), "window": jax.random.PRNGKey(1)}, x)
    outs = d.apply(v, x, rngs={"window": jax.random.PRNGKey(2)})
    assert len(outs) == 4  # repeats * num windows


def test_gblock_generator(rng):
    # in_channels includes ar_output per the reference convention (13 + 16)
    m = GBlockGenerator(in_channels=29, channels=64, g_scales=(4, 2),
                        g_kernel_sizes=(3, 3), use_ar=True, ar_input=128,
                        ar_hidden=32, ar_output=16)
    c = jnp.asarray(rng.standard_normal((2, 10, 13)), jnp.float32)
    ar = jnp.asarray(rng.standard_normal((2, 128, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), c, ar=ar)
    y = m.apply(v, c, ar=ar)
    assert y.shape == (2, 80, 1)


def test_bigru(rng):
    m = BiGRU(in_channels=80, hidden_size=32, out_channels=12)
    x = jnp.asarray(rng.standard_normal((2, 40, 80)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 40, 12)


def test_bigru_matches_torch_gru(rng):
    """Verify the GRU recurrence matches torch.nn.GRU numerically."""
    import torch

    from articulatory_tpu.models.rnn import GRULayer

    h, cin, t, b = 16, 8, 20, 2
    tg = torch.nn.GRU(input_size=cin, hidden_size=h, num_layers=1,
                      batch_first=True, bidirectional=False)
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    with torch.no_grad():
        y_ref, _ = tg(torch.from_numpy(x))
    layer = GRULayer(hidden_size=h)
    params = {
        "w_ih": tg.weight_ih_l0.detach().numpy(),
        "w_hh": tg.weight_hh_l0.detach().numpy(),
        "b_ih": tg.bias_ih_l0.detach().numpy(),
        "b_hh": tg.bias_hh_l0.detach().numpy(),
    }
    y = layer.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_transformer(rng):
    m = Transformer(in_channels=13, out_channels=80, elayers=2, hidden_dim=64)
    x = jnp.asarray(rng.standard_normal((2, 30, 13)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 30, 80)


def test_transformer_extra_art(rng):
    m = Transformer(in_channels=13, out_channels=80, elayers=1, hidden_dim=64,
                    extra_art=True)
    x = jnp.asarray(rng.standard_normal((2, 30, 13)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 29, 80)


def test_registry_builds_from_yaml_lists():
    m = build_model("HiFiGANGenerator", {
        "in_channels": 13, "channels": 32,
        "upsample_scales": [4, 2], "upsample_kernel_sizes": [8, 4],
        "resblock_kernel_sizes": [3], "resblock_dilations": [[1, 3]],
    })
    c = jnp.zeros((1, 10, 13))
    v = m.init(jax.random.PRNGKey(0), c)
    assert m.apply(v, c).shape == (1, 80, 1)
