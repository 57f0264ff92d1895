"""Top-level ``time_packing`` config key (articulatory_tpu/config.py).

The key lives at the TOP level of the experiment yaml so generator_params
stays reference-compatible (a torch-exported checkpoint's config.yml must
construct the reference HiFiGANGenerator without unknown kwargs); our train
and load_model paths inject it into the generator at build time. The
transform itself is exact-equivalence (ops/packed_conv.py, tested in
test_packed_generator.py) — here we pin the plumbing.
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from articulatory_tpu.config import inject_time_packing


GEN_PARAMS = dict(in_channels=13, out_channels=1, channels=32, kernel_size=7,
                  upsample_scales=[5, 4, 2, 2],
                  upsample_kernel_sizes=[10, 8, 4, 4],
                  resblock_kernel_sizes=[3], resblock_dilations=[[1, 3]])


def test_injection_only_for_supported_generators():
    config = {"time_packing": "auto"}
    out = inject_time_packing("HiFiGANGenerator", GEN_PARAMS, config)
    assert out["time_packing"] == "auto"
    assert "time_packing" not in GEN_PARAMS  # no mutation
    assert inject_time_packing("BiGRU", GEN_PARAMS, config) == GEN_PARAMS
    assert inject_time_packing("HiFiGANGenerator", GEN_PARAMS, {}) == GEN_PARAMS
    # explicit generator_params setting wins over the top-level key
    explicit = {**GEN_PARAMS, "time_packing": None}
    assert inject_time_packing("HiFiGANGenerator", explicit,
                               config)["time_packing"] is None


def test_shipped_configs_carry_top_level_key():
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in ("egs/ema/voc1/conf/e2w_hifigan.yaml",
                "egs/ema/voc1/conf/e2w_hifigan_car.yaml",
                "egs/mri/voc1/conf/mri2w_hifigan_car.yaml"):
        with open(os.path.join(root, rel)) as f:
            cfg = yaml.safe_load(f)
        assert cfg.get("time_packing") == "auto", rel
        assert "time_packing" not in cfg["generator_params"], rel


def test_train_init_models_honors_top_level_key(rng):
    from articulatory_tpu.bin.train import init_models

    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": dict(GEN_PARAMS),
        "discriminator_type": "HiFiGANMultiScaleMultiPeriodDiscriminator",
        "discriminator_params": {
            "scales": 1,
            "scale_discriminator_params": {"channels": 8,
                                           "max_downsample_channels": 16,
                                           "max_groups": 2},
            "periods": [2],
            "period_discriminator_params": {"channels": 2,
                                            "max_downsample_channels": 4}},
        "time_packing": "auto",
    }
    batch = {"x": (rng.standard_normal((1, 20, 13)).astype(np.float32),),
             "y": rng.standard_normal((1, 1600, 1)).astype(np.float32)}
    gen, gen2, disc, *_ = init_models(config, batch)
    assert gen.time_packing == "auto"
    assert "time_packing" not in config["generator_params"]  # no mutation


def test_train_init_models_injects_into_generator2(rng):
    """The cascade's second generator gets the same top-level packing key
    (regression: only the primary generator was injected, so train built
    gen2 unpacked while load_model built it packed)."""
    from articulatory_tpu.bin.train import init_models

    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": dict(GEN_PARAMS),
        "generator2_type": "HiFiGANGenerator",
        "generator2_params": dict(GEN_PARAMS, in_channels=1, channels=16,
                                  upsample_scales=[2, 2],
                                  upsample_kernel_sizes=[4, 4]),
        "discriminator_type": "HiFiGANMultiScaleMultiPeriodDiscriminator",
        "discriminator_params": {
            "scales": 1,
            "scale_discriminator_params": {"channels": 8,
                                           "max_downsample_channels": 16,
                                           "max_groups": 2},
            "periods": [2],
            "period_discriminator_params": {"channels": 2,
                                            "max_downsample_channels": 4}},
        "time_packing": "auto",
    }
    batch = {"x": (rng.standard_normal((1, 20, 13)).astype(np.float32),),
             "y": rng.standard_normal((1, 6400, 1)).astype(np.float32)}
    gen, gen2, *_ = init_models(config, batch)
    assert gen.time_packing == "auto"
    assert gen2.time_packing == "auto"
    assert "time_packing" not in config["generator2_params"]  # no mutation


def test_load_model_honors_top_level_key(tmp_path, rng):
    import flax.serialization

    from articulatory_tpu.inference import load_model
    from articulatory_tpu.models import HiFiGANGenerator

    model = HiFiGANGenerator(
        **{**GEN_PARAMS, "upsample_scales": (5, 4, 2, 2),
           "upsample_kernel_sizes": (10, 8, 4, 4),
           "resblock_kernel_sizes": (3,), "resblock_dilations": ((1, 3),)})
    c = jnp.asarray(rng.standard_normal((1, 20, 13)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), c)["params"]
    payload = {"model": {"generator": jax.tree.map(np.asarray, params)},
               "mutables": {}, "optimizer": {}, "scheduler": {},
               "steps": 0, "epochs": 0}
    ckpt = tmp_path / "best_mel_ckpt.pkl"
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))

    config = {"generator_type": "HiFiGANGenerator",
              "generator_params": dict(GEN_PARAMS), "format": "hdf5",
              "sampling_rate": 16000, "hop_size": 80,
              "time_packing": "auto"}
    packed = load_model(str(ckpt), config)
    assert packed.model.time_packing == "auto"
    unpacked = load_model(str(ckpt), {**config, "time_packing": None})
    assert unpacked.model.time_packing is None
    # same checkpoint params drive both; outputs match (exact equivalence)
    y_p = packed.inference(np.asarray(c[0]))
    y_u = unpacked.inference(np.asarray(c[0]))
    np.testing.assert_allclose(y_p, y_u, rtol=1e-4, atol=2e-4)
