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


def test_packed_generator_bf16_compute(rng):
    """time_packing + compute_dtype=bf16 must compose (the packed conv casts
    its weights like Conv1d does; regression for the uncast-kernel crash)."""
    kw = dict(in_channels=13, channels=64, kernel_size=7,
              upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
              resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    plain = HiFiGANGenerator(**kw)
    packed16 = HiFiGANGenerator(**kw, time_packing="auto",
                                compute_dtype=jnp.bfloat16)
    c = jnp.asarray(rng.standard_normal((2, 20, 13)), jnp.float32)
    v = plain.init(jax.random.PRNGKey(0), c)
    y1 = plain.apply(v, c)
    y2 = packed16.apply(v, c)
    assert y2.dtype == jnp.float32  # output cast back
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=2e-2, atol=2e-2)
