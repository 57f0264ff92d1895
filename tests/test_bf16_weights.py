"""bf16 weight residency (LoadedModel.to_bf16_weights): storage-only cast,
decode paths run, error stays at bf16 rounding scale."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.inference import LoadedModel, ar_loop, ar_loop_scan
from articulatory_tpu.models import HiFiGANGenerator

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


def test_bf16_weights_leaves_and_outputs(rng):
    model = _tiny_model()
    x = rng.standard_normal((30, 13)).astype(np.float32)
    ref = np.asarray(ar_loop(model, x, CONFIG))

    model.to_bf16_weights()
    for leaf in jax.tree.leaves(model.params):
        assert leaf.dtype == jnp.bfloat16
    out = np.asarray(ar_loop(model, x, CONFIG))
    assert out.dtype == np.float32 and out.shape == ref.shape
    # weight rounding is ~2^-8 relative; the conv chains amplify modestly
    err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 0.1, err

    # the compiled scan path runs on the same bf16-stored params and
    # matches the host loop on it
    scan = np.asarray(ar_loop_scan(model, x, CONFIG))
    np.testing.assert_allclose(scan, out, rtol=1e-4, atol=1e-5)


def test_bf16_weights_hybrid_packed(rng):
    """The production serve config (hybrid precision + time packing) with
    bf16-stored weights: the packed f32 AR-path convs must upcast in-read
    (this exact combination raised a lax dtype mismatch before the fix)."""
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8, time_packing="auto", compute_dtype=jnp.bfloat16,
        hybrid_precision=True)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 64, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=CONFIG,
                        mutables={})
    x = rng.standard_normal((30, 13)).astype(np.float32)
    ref = np.asarray(ar_loop(model, x, CONFIG))
    model.to_bf16_weights()
    out = np.asarray(ar_loop(model, x, CONFIG))
    assert out.shape == ref.shape and np.all(np.isfinite(out))
    err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 0.1, err


def test_bf16_weights_full_inference(rng):
    """Non-AR inference path (jit_forward) with f32 input / bf16 weights."""
    model_def = HiFiGANGenerator(
        in_channels=13, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),))
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)))
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": False}}
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})
    x = rng.standard_normal((25, 13)).astype(np.float32)
    ref = np.asarray(model.inference(x))
    model.to_bf16_weights()
    got = np.asarray(model.inference(x))
    assert got.shape == ref.shape and np.all(np.isfinite(got))
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 0.1, err
