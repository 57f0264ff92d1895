"""Export path: StableHLO serialization of a generator forward."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.export import to_stablehlo
from articulatory_tpu.models import MelGANGenerator


def test_stablehlo_roundtrip(rng):
    model = MelGANGenerator(in_channels=13, channels=64, upsample_scales=(4, 2))
    c = jnp.asarray(rng.standard_normal((1, 10, 13)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), c)
    exported = to_stablehlo(model, variables, (c,))
    blob = exported.serialize()
    assert len(blob) > 1000

    from jax import export as jax_export

    restored = jax_export.deserialize(blob)
    y = restored.call(c)
    y_ref = model.apply(variables, c)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
