"""time_packing='auto' generator equals the unpacked generator exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import HiFiGANGenerator


def test_packed_generator_matches_unpacked(rng):
    kw = dict(in_channels=13, channels=128, kernel_size=7,
              upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
              resblock_kernel_sizes=(3, 7), resblock_dilations=((1, 3), (1, 3)))
    plain = HiFiGANGenerator(**kw)
    packed = HiFiGANGenerator(**kw, time_packing="auto")
    c = jnp.asarray(rng.standard_normal((2, 20, 13)), jnp.float32)
    v = plain.init(jax.random.PRNGKey(0), c)
    y1 = plain.apply(v, c)
    y2 = packed.apply(v, c)  # same params, packed compute path
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)
