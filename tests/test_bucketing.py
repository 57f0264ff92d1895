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
