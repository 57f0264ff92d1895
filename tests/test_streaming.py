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


def _bigru_w2a(rng, out_ch=4, ar_input=16, chunk=100):
    from articulatory_tpu.models import BiGRU

    model_def = BiGRU(in_channels=5 + 8, hidden_size=8, out_channels=out_ch,
                      use_ar=True, ar_input=ar_input, ar_hidden=8,
                      ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 5)),
                       ar=jnp.zeros((1, ar_input // out_ch, out_ch)))
    config = {"dataset_mode": "w2a", "batch_max_steps": chunk, "hop_size": 80,
              "generator_params": {"out_channels": out_ch, "use_ar": True,
                                   "ar_input": ar_input}}
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={k: x for k, x in v.items()
                                  if k != "params"})
    return model, config


def test_streaming_w2a_matches_ar_loop(rng):
    """Inversion streaming (dataset_mode: w2a): per-chunk trajectory output
    equals the offline ar_loop on complete chunks, with the reference's
    ragged-tail semantics — a >= hop remainder is kept (computed under zero
    padding, so only the full-chunk prefix compares exactly against the
    host loop's dynamic-shape tail), a sub-hop remainder is dropped
    (reference decode.py:57-58)."""
    model, config = _bigru_w2a(rng)

    # (input rows, expected output frames, exactly-matching prefix)
    for t, ref_len, full in ((300, 300, 300), (290, 290, 200), (250, 200, 200)):
        x = rng.standard_normal((t, 5)).astype(np.float32)
        offline = np.asarray(ar_loop(model, x, config))
        assert offline.shape == (ref_len, 4)
        stream = StreamingSynthesizer(model, config)
        streamed = np.concatenate(list(stream.synthesize(x)))
        assert streamed.shape == offline.shape
        np.testing.assert_allclose(streamed[:full], offline[:full],
                                   rtol=1e-4, atol=1e-5)

    # synthesize_all rides ar_loop_scan's w2a path; full-chunk stream is
    # identical to the chunked stream
    x = rng.standard_normal((300, 5)).astype(np.float32)
    stream = StreamingSynthesizer(model, config)
    chunked = np.concatenate(list(stream.synthesize(x)))
    stream.reset()
    whole = np.asarray(stream.synthesize_all(x))
    assert whole.shape == chunked.shape
    np.testing.assert_allclose(whole, chunked, rtol=1e-4, atol=1e-5)


def test_streaming_w2a_shift_register_matches_ar_loop(rng):
    """w2a with ar carry spanning several chunks (past frames > chunk rows,
    compared against the SAMPLE chunk length as in reference decode.py:77):
    the streaming carry slides like the offline shift register."""
    model, config = _bigru_w2a(rng, out_ch=2, ar_input=300)  # 150 > 100

    x = rng.standard_normal((500, 5)).astype(np.float32)  # 5 full chunks
    offline = np.asarray(ar_loop(model, x, config))
    stream = StreamingSynthesizer(model, config)
    assert stream.shift_register
    streamed = np.concatenate(list(stream.synthesize(x)))
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)
