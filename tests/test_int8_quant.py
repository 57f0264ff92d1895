"""int8 weight quantization: round-trip error bounds and decode-path wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.inference import LoadedModel, ar_loop, ar_loop_scan
from articulatory_tpu.models import HiFiGANGenerator
from articulatory_tpu.utils.quantize import (
    dequantize_params,
    has_quantized_leaves,
    quantize_params_int8,
)

CONFIG = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
          "generator_params": {"out_channels": 1, "use_ar": True,
                               "ar_input": 64}}


def _tiny_model():
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                   ar=jnp.zeros((1, 64, 1)))
    return LoadedModel(model=model, params=v["params"], config=CONFIG,
                       mutables={})


def test_quant_roundtrip_error_bound(rng):
    w = rng.standard_normal((7, 64, 48)).astype(np.float32)
    q = quantize_params_int8({"kernel": w}, min_size=1)
    assert has_quantized_leaves(q)
    back = np.asarray(dequantize_params(q)["kernel"])
    # symmetric quant: |err| <= s/2 per element, s = max|w| per out-channel/127
    s = np.abs(w).max(axis=(0, 1)) / 127.0
    assert np.all(np.abs(back - w) <= s[None, None, :] / 2 + 1e-7)


def test_quant_skips_small_leaves(rng):
    tree = {"bias": rng.standard_normal(48).astype(np.float32),
            "gain": np.float32(1.5)}
    q = quantize_params_int8(tree)
    assert not has_quantized_leaves(q)
    np.testing.assert_array_equal(q["bias"], tree["bias"])


def test_int8_decode_close_and_scan_consistent(rng):
    model = _tiny_model()
    x = rng.standard_normal((30, 13)).astype(np.float32)
    y_f32 = np.asarray(ar_loop(model, x, CONFIG))

    model.quantize_int8()
    assert model.quantized and has_quantized_leaves(model.params)
    y_q = np.asarray(ar_loop(model, x, CONFIG))
    # int8 is a lossy rewrite: outputs must stay correlated with f32 (the
    # quality budget is decided on trained weights by tools/int8_quality_ab)
    assert y_q.shape == y_f32.shape
    denom = np.sqrt((y_f32 ** 2).mean()) + 1e-9
    rel = np.sqrt(((y_q - y_f32) ** 2).mean()) / denom
    assert rel < 0.5, f"int8 decode wildly off (rel RMSE {rel:.3f})"

    # the scan path must agree with the host loop UNDER quantization
    y_scan = ar_loop_scan(model, x, CONFIG)
    np.testing.assert_allclose(y_scan, y_q, rtol=1e-4, atol=1e-5)


def test_streaming_int8(rng):
    from articulatory_tpu.streaming import StreamingSynthesizer

    model = _tiny_model()
    model.quantize_int8()
    x = rng.standard_normal((20, 13)).astype(np.float32)
    offline = np.asarray(ar_loop(model, x, CONFIG))
    stream = StreamingSynthesizer(model, CONFIG)
    streamed = np.concatenate([c[:, 0] for c in stream.synthesize(x)])
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)
