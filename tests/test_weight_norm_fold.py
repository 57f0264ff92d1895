"""Weight-norm fold: identical outputs, folded v equals effective kernel."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import HiFiGANGenerator
from articulatory_tpu.utils.weight_norm import fold_weight_norm


def test_fold_preserves_outputs(rng):
    model = HiFiGANGenerator(in_channels=13, channels=32,
                             upsample_scales=(4, 2), upsample_kernel_sizes=(8, 4),
                             resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    c = jnp.asarray(rng.standard_normal((2, 10, 13)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), c)
    y0 = model.apply(v, c)

    folded = fold_weight_norm(jax.device_get(v["params"]))
    y1 = model.apply({"params": folded}, c)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)

    # after folding, v IS the effective kernel (g == ||v|| per slice)
    entry = folded["input_conv"]
    axes = tuple(i for i, s in enumerate(entry["g"].shape) if s == 1)
    norm = np.sqrt((entry["v"] ** 2).sum(axis=axes, keepdims=True))
    np.testing.assert_allclose(entry["g"], norm, rtol=1e-6)
