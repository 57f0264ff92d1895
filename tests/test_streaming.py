"""Streaming synthesizer: chunk-stream output equals the offline ar_loop."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.inference import LoadedModel, ar_loop
from articulatory_tpu.models import HiFiGANGenerator
from articulatory_tpu.streaming import StreamingSynthesizer


def test_streaming_matches_ar_loop(rng):
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 64, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})

    x = rng.standard_normal((30, 13)).astype(np.float32)  # 3 full chunks
    offline = np.asarray(ar_loop(model, x, config))

    stream = StreamingSynthesizer(model, config)
    chunks = list(stream.synthesize(x))
    streamed = np.concatenate([c[:, 0] for c in chunks])
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)

    # reset gives a fresh stream identical to the first
    stream.reset()
    chunks2 = list(stream.synthesize(x))
    np.testing.assert_array_equal(np.concatenate([c[:, 0] for c in chunks2]),
                                  streamed)


def test_streaming_shift_register_matches_ar_loop(rng):
    """ar_input > batch_max_steps: the streaming carry slides across chunks
    like the reference's shift register (decode.py:79-81)."""
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 2000}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=2000, ar_hidden=8,
        ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 2000, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})

    x = rng.standard_normal((50, 13)).astype(np.float32)  # 5 full chunks
    offline = np.asarray(ar_loop(model, x, config))
    stream = StreamingSynthesizer(model, config)
    streamed = np.concatenate([c[:, 0] for c in stream.synthesize(x)])
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_synthesize_all_matches_chunked(rng):
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 64, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})
    stream = StreamingSynthesizer(model, config)

    x = rng.standard_normal((27, 13)).astype(np.float32)  # ragged tail
    chunked = np.concatenate([c[:, 0] for c in stream.synthesize(x)])
    stream.reset()
    whole = stream.synthesize_all(x)
    assert whole.shape == chunked.shape
    # full chunks match exactly; the padded tail chunk sees zero-padding in
    # both paths, so it matches too
    np.testing.assert_allclose(whole, chunked, rtol=1e-4, atol=1e-5)


def test_streaming_pipeline_depths_identical(rng):
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 64, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})
    stream = StreamingSynthesizer(model, config)
    x = rng.standard_normal((30, 13)).astype(np.float32)
    d1 = np.concatenate([c[:, 0] for c in stream.synthesize(x, pipeline_depth=1)])
    stream.reset()
    d4 = np.concatenate([c[:, 0] for c in stream.synthesize(x, pipeline_depth=4)])
    np.testing.assert_array_equal(d1, d4)
