"""Length-bucketed inference: exact away from the tail, bounded tail error."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.inference import LoadedModel
from articulatory_tpu.models import HiFiGANGenerator


def test_bucketed_inference_matches_exact(rng):
    model_def = HiFiGANGenerator(
        in_channels=13, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),))
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)))
    model = LoadedModel(model=model_def, params=v["params"],
                        config={"generator_params": {"out_channels": 1}},
                        mutables={})

    c = rng.standard_normal((37, 13)).astype(np.float32)  # odd length
    exact = model.inference(c)
    bucketed = model.inference(c, bucket_frames=16)  # pads to 48 frames
    assert bucketed.shape == exact.shape
    hop = 80
    # receptive field of the conv stack in output samples (upper bound)
    rf_out = 4000
    np.testing.assert_allclose(bucketed[: len(exact) - rf_out],
                               exact[: len(exact) - rf_out],
                               rtol=1e-4, atol=1e-5)
    # tail deviation exists but is bounded
    assert np.abs(bucketed - exact).max() < 1.0


def test_bucketed_inference_downsampling_model(rng):
    """w2a-style inversion models produce FEWER frames than input samples;
    the bucket trim must use the rational in/out ratio, not integer-division
    scale (which is 0 and produced empty outputs)."""
    import flax.linen as nn

    class Downsample4(nn.Module):
        @nn.compact
        def __call__(self, x):  # (B, T, C) -> (B, T//4, C)
            b, t, c = x.shape
            return x.reshape(b, t // 4, 4, c).mean(axis=2)

    model_def = Downsample4()
    model = LoadedModel(model=model_def, params={},
                        config={"generator_params": {"out_channels": 1}},
                        mutables={})
    c = rng.standard_normal((36, 1)).astype(np.float32)
    out = model.inference(c, bucket_frames=16)  # pads to 48 -> out 12
    assert out.shape[0] == 36 // 4
    exact = model.inference(c)
    np.testing.assert_allclose(out, exact, rtol=1e-6)
