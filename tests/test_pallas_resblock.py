"""Pallas fused residual pair: interpreter-mode correctness vs XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from articulatory_tpu.ops.pallas.resblock import (
    resblock_pair_pallas,
    resblock_pair_reference,
)


@pytest.mark.parametrize("dilation", [1, 3, 5])
def test_fused_pair_matches_reference(rng, dilation):
    b, t, c, k = 2, 512, 32, 3
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    w1 = (rng.standard_normal((k, c, c)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((k, c, c)) * 0.1).astype(np.float32)
    b1 = rng.standard_normal((c,)).astype(np.float32)
    b2 = rng.standard_normal((c,)).astype(np.float32)

    ref = resblock_pair_reference(jnp.asarray(x), jnp.asarray(w1),
                                  jnp.asarray(b1), jnp.asarray(w2),
                                  jnp.asarray(b2), dilation=dilation)
    out = resblock_pair_pallas(jnp.asarray(x), jnp.asarray(w1),
                               jnp.asarray(b1), jnp.asarray(w2),
                               jnp.asarray(b2), dilation=dilation,
                               t_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
