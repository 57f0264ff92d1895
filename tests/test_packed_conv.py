"""Packed (space-to-depth) conv: exact parity with the plain SAME conv."""

import numpy as np
import pytest

import jax.numpy as jnp

from articulatory_tpu.ops.conv import conv1d
from articulatory_tpu.ops.packed_conv import conv1d_packed_same


@pytest.mark.parametrize("k,d,p", [
    (3, 1, 4), (3, 3, 4), (3, 5, 4), (7, 1, 4), (7, 3, 4),
    (11, 5, 4), (3, 1, 2), (11, 1, 8),
])
def test_packed_conv_matches_plain(rng, k, d, p):
    b, t, c = 2, 64, 8
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    w = (rng.standard_normal((k, c, c)) * 0.2).astype(np.float32)
    bias = rng.standard_normal((c,)).astype(np.float32)

    ref = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
                 padding=(k - 1) // 2 * d, dilation=d)
    out = conv1d_packed_same(jnp.asarray(x), jnp.asarray(w),
                             jnp.asarray(bias), dilation=d, p=p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
