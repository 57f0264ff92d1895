"""Interpreter-mode correctness of the fused scale-disc head kernel.

The kernel contracts in bf16 (XLA's own default-precision conv contract),
so comparisons against the f32 XLA reference use bf16-scale tolerances.
"""

import numpy as np
import pytest

from articulatory_tpu.ops.pallas.scale_disc_head import (
    scale_disc_head_pallas,
    scale_disc_head_reference,
)


@pytest.mark.parametrize("t,th", [(2176, 544), (1024, 256), (900, 256)])
def test_matches_xla_reference(t, th):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, t, 1)).astype(np.float32) * 0.3
    w0 = rng.standard_normal((15, 1, 128)).astype(np.float32) * 0.1
    b0 = rng.standard_normal((128,)).astype(np.float32) * 0.01
    wg = rng.standard_normal((41, 32, 128)).astype(np.float32) * 0.05
    b1 = rng.standard_normal((128,)).astype(np.float32) * 0.01

    h0e, h0o, h1 = scale_disc_head_pallas(x, w0, b0, wg, b1, th=th,
                                          interpret=True)
    h0_ref, h1_ref = scale_disc_head_reference(x, w0, b0, wg, b1)

    assert h0e.shape == (2, t // 2, 128)
    assert h1.shape == h1_ref.shape == (2, t // 2, 128)
    np.testing.assert_allclose(h0e, h0_ref[:, 0::2], atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(h0o, h0_ref[:, 1::2], atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(h1, h1_ref, atol=6e-2, rtol=2e-2)
