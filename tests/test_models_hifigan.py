"""HiFiGAN generator/discriminator: shapes, grads, and reference parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from articulatory_tpu.models.hifigan import (
    HiFiGANGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)

from conftest import requires_reference

E2W_GEN_KW = dict(
    in_channels=141, out_channels=1, channels=128, kernel_size=7,
    upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    use_ar=True, ar_input=512, ar_hidden=64, ar_output=128,
)


def test_generator_shapes(rng):
    model = HiFiGANGenerator(**E2W_GEN_KW)
    c = jnp.asarray(rng.standard_normal((2, 25, 13)), jnp.float32)
    ar = jnp.asarray(rng.standard_normal((2, 512, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), c, ar=ar)
    y = model.apply(variables, c, ar=ar)
    assert y.shape == (2, 25 * 80, 1)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)


def test_generator_grad_flows(rng):
    model = HiFiGANGenerator(in_channels=13, channels=32,
                             upsample_scales=(4, 2), upsample_kernel_sizes=(8, 4),
                             resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    c = jnp.asarray(rng.standard_normal((1, 16, 13)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), c)

    def loss(params):
        return jnp.mean(model.apply({"params": params}, c) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_discriminator_shapes(rng):
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scale_discriminator_params={"channels": 16, "max_downsample_channels": 64},
        period_discriminator_params={"channels": 4, "max_downsample_channels": 32},
    )
    x = jnp.asarray(rng.standard_normal((2, 2000, 1)), jnp.float32)
    variables = disc.init(jax.random.PRNGKey(0), x)
    outs = disc.apply(variables, x)
    assert len(outs) == 3 + 5  # 3 scales + 5 periods
    for fmaps in outs:
        assert len(fmaps) >= 6


@requires_reference
def test_generator_matches_reference(reference, rng):
    import torch
    from articulatory.models import HiFiGANGenerator as RefGen

    from articulatory_tpu.utils.torch_import import import_hifigan_generator

    cfg = dict(in_channels=141, out_channels=1, channels=64, kernel_size=7,
               upsample_scales=[5, 4, 2, 2], upsample_kernel_sizes=[10, 8, 4, 4],
               resblock_kernel_sizes=[3, 7, 11],
               resblock_dilations=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
               use_ar=True, ar_input=512, ar_hidden=64, ar_output=128)
    torch.manual_seed(0)
    ref = RefGen(**cfg)
    ref.eval()

    params = import_hifigan_generator(ref.state_dict(), cfg)
    ours = HiFiGANGenerator(**{**cfg,
                               "upsample_scales": tuple(cfg["upsample_scales"]),
                               "upsample_kernel_sizes": tuple(cfg["upsample_kernel_sizes"]),
                               "resblock_kernel_sizes": tuple(cfg["resblock_kernel_sizes"]),
                               "resblock_dilations": tuple(map(tuple, cfg["resblock_dilations"]))})

    c = rng.standard_normal((2, 13, 25)).astype(np.float32)
    ar = rng.standard_normal((2, 1, 512)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c), ar=torch.from_numpy(ar)).numpy()

    y_ours = ours.apply({"params": params},
                        jnp.asarray(np.transpose(c, (0, 2, 1))),
                        ar=jnp.asarray(np.transpose(ar, (0, 2, 1))))
    y_ours = np.transpose(np.asarray(y_ours), (0, 2, 1))
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=1e-4)


@requires_reference
def test_msmpd_matches_reference(reference, rng):
    import torch
    from articulatory.models import (
        HiFiGANMultiScaleMultiPeriodDiscriminator as RefDisc,
    )

    from articulatory_tpu.utils.torch_import import import_hifigan_msmpd

    cfg = dict(
        scales=2,
        scale_discriminator_params={"channels": 16, "max_downsample_channels": 64,
                                    "downsample_scales": [2, 2, 4, 4, 1]},
        periods=[2, 3],
        period_discriminator_params={"channels": 4, "max_downsample_channels": 32,
                                     "downsample_scales": [3, 3, 3, 3, 1]},
        follow_official_norm=False,
    )
    torch.manual_seed(0)
    ref = RefDisc(**cfg)
    ref.eval()

    params = import_hifigan_msmpd(ref.state_dict(), cfg)
    ours = HiFiGANMultiScaleMultiPeriodDiscriminator(**cfg)

    x = rng.standard_normal((2, 1, 2000)).astype(np.float32)
    with torch.no_grad():
        outs_ref = ref(torch.from_numpy(x))
    outs_ours = ours.apply({"params": params},
                           jnp.asarray(np.transpose(x, (0, 2, 1))))
    assert len(outs_ref) == len(outs_ours)
    for fr, fo in zip(outs_ref, outs_ours):
        assert len(fr) == len(fo)
        for tr, to in zip(fr, fo):
            tr = tr.numpy()
            to = np.asarray(to)
            if tr.ndim == 3:  # (B, C, T) vs (B, T, C)
                to = np.transpose(to, (0, 2, 1))
            elif tr.ndim == 4:  # (B, C, H, W) vs (B, H, W, C)
                to = np.transpose(to, (0, 3, 1, 2))
            np.testing.assert_allclose(to, tr, rtol=1e-3, atol=1e-4)


@requires_reference
def test_generator_spk_matches_reference(reference, rng):
    """use_spk_id (additive speaker embedding, hifigan.py:212-216) parity.
    Note the reference cannot combine use_spk_id with use_ph or use_ar:
    spk_fc projects to in_channels and is added *before* the ph/ar concats,
    so the channel counts only line up when spk_id is the sole hook."""
    import torch
    from articulatory.models import HiFiGANGenerator as RefGen

    from articulatory_tpu.utils.torch_import import import_hifigan_generator

    cfg = dict(in_channels=13, out_channels=1, channels=32, kernel_size=7,
               upsample_scales=[4, 2], upsample_kernel_sizes=[8, 4],
               resblock_kernel_sizes=[3], resblock_dilations=[[1, 3]],
               use_spk_id=True, num_spk=4, spk_emb_size=8)
    torch.manual_seed(0)
    ref = RefGen(**cfg)
    ref.eval()

    params = import_hifigan_generator(ref.state_dict(), cfg)
    ours = HiFiGANGenerator(**{**cfg,
                               "upsample_scales": tuple(cfg["upsample_scales"]),
                               "upsample_kernel_sizes": tuple(cfg["upsample_kernel_sizes"]),
                               "resblock_kernel_sizes": tuple(cfg["resblock_kernel_sizes"]),
                               "resblock_dilations": tuple(map(tuple, cfg["resblock_dilations"]))})

    b, t = 2, 25
    c = rng.standard_normal((b, 13, t)).astype(np.float32)
    spk_id = rng.integers(0, 4, (b,))
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c),
                    spk_id=torch.from_numpy(spk_id)).numpy()

    y_ours = ours.apply({"params": params},
                        jnp.asarray(np.transpose(c, (0, 2, 1))),
                        spk_id=jnp.asarray(spk_id, jnp.int32))
    y_ours = np.transpose(np.asarray(y_ours), (0, 2, 1))
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=1e-4)


@requires_reference
def test_generator_ph_matches_reference(reference, rng):
    """use_ph (phoneme-embedding concat, hifigan.py:217-220) parity:
    in_channels includes the embedding width (13 feats + 8 ph emb)."""
    import torch
    from articulatory.models import HiFiGANGenerator as RefGen

    from articulatory_tpu.utils.torch_import import import_hifigan_generator

    cfg = dict(in_channels=21, out_channels=1, channels=32, kernel_size=7,
               upsample_scales=[4, 2], upsample_kernel_sizes=[8, 4],
               resblock_kernel_sizes=[3], resblock_dilations=[[1, 3]],
               use_ph=True, num_ph=6, ph_emb_size=8)
    torch.manual_seed(0)
    ref = RefGen(**cfg)
    ref.eval()

    params = import_hifigan_generator(ref.state_dict(), cfg)
    ours = HiFiGANGenerator(**{**cfg,
                               "upsample_scales": tuple(cfg["upsample_scales"]),
                               "upsample_kernel_sizes": tuple(cfg["upsample_kernel_sizes"]),
                               "resblock_kernel_sizes": tuple(cfg["resblock_kernel_sizes"]),
                               "resblock_dilations": tuple(map(tuple, cfg["resblock_dilations"]))})

    b, t = 2, 25
    c = rng.standard_normal((b, 13, t)).astype(np.float32)
    ph = rng.integers(0, 6, (b, t))
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(c), ph=torch.from_numpy(ph)).numpy()

    y_ours = ours.apply({"params": params},
                        jnp.asarray(np.transpose(c, (0, 2, 1))),
                        ph=jnp.asarray(ph, jnp.int32))
    y_ours = np.transpose(np.asarray(y_ours), (0, 2, 1))
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=1e-4)


def test_hybrid_precision_generator(rng):
    """hybrid_precision keeps input conv + final stage + output conv in f32
    with a bf16 interior: output is f32 and materially closer to the full-f32
    forward than the all-bf16 variant (the AR-feedback-safety rationale,
    docs/DESIGN.md §7)."""
    kw = dict(in_channels=21, out_channels=1, channels=32, kernel_size=7,
              upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
              resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
              use_ar=True, ar_input=64, ar_hidden=8, ar_output=8)
    g32 = HiFiGANGenerator(**kw)
    gbf = HiFiGANGenerator(**kw, compute_dtype=jnp.bfloat16)
    ghy = HiFiGANGenerator(**kw, compute_dtype=jnp.bfloat16,
                           hybrid_precision=True)
    c = jnp.asarray(rng.standard_normal((2, 20, 13)), jnp.float32)
    ar = jnp.asarray(rng.standard_normal((2, 64, 1)) * 0.1, jnp.float32)
    v = g32.init(jax.random.PRNGKey(0), c, ar=ar)
    y32 = g32.apply(v, c, ar=ar)
    ybf = gbf.apply(v, c, ar=ar)
    yhy = ghy.apply(v, c, ar=ar)
    assert yhy.dtype == jnp.float32
    e_bf = float(jnp.abs(ybf - y32).max())
    e_hy = float(jnp.abs(yhy - y32).max())
    assert e_hy < 0.25 * e_bf, (e_hy, e_bf)
    # and it composes with time packing (packed convs cast like Conv1d)
    ghp = HiFiGANGenerator(**kw, compute_dtype=jnp.bfloat16,
                           hybrid_precision=True, time_packing="auto")
    yhp = ghp.apply(v, c, ar=ar)
    assert float(jnp.abs(yhp - y32).max()) < 0.25 * e_bf
