"""PQMF parity vs the reference module and reconstruction quality."""

import numpy as np
import pytest

import jax.numpy as jnp

from articulatory_tpu.ops.pqmf import PQMF, design_prototype_filter

from conftest import requires_reference


def test_prototype_filter_shape():
    h = design_prototype_filter(62, 0.142, 9.0)
    assert h.shape == (63,)
    assert abs(h[31] - 0.142 * 1.0) < 0.01  # center tap ~ cutoff * kaiser(center)=~


def test_analysis_synthesis_roundtrip(rng):
    pqmf = PQMF(subbands=4)
    x = rng.standard_normal((1, 4096, 1)).astype(np.float32)
    sub = pqmf.analysis(jnp.asarray(x))
    assert sub.shape == (1, 1024, 4)
    rec = pqmf.synthesis(sub)
    assert rec.shape == x.shape
    # near-perfect reconstruction (the taps//2 pads center the filters,
    # so analysis+synthesis is zero-delay)
    corr = np.corrcoef(np.asarray(rec)[0, :, 0], x[0, :, 0])[0, 1]
    assert corr > 0.999


@requires_reference
def test_matches_reference_pqmf(reference, rng):
    import torch
    from articulatory.layers import PQMF as RefPQMF

    ref = RefPQMF(subbands=4)
    ours = PQMF(subbands=4)
    x = rng.standard_normal((2, 1, 4096)).astype(np.float32)

    with torch.no_grad():
        sub_ref = ref.analysis(torch.from_numpy(x)).numpy()  # (B, 4, T/4)
    sub_ours = np.asarray(ours.analysis(jnp.asarray(np.transpose(x, (0, 2, 1)))))
    np.testing.assert_allclose(np.transpose(sub_ours, (0, 2, 1)), sub_ref,
                               rtol=1e-4, atol=1e-5)

    with torch.no_grad():
        rec_ref = ref.synthesis(torch.from_numpy(sub_ref)).numpy()
    rec_ours = np.asarray(ours.synthesis(jnp.asarray(sub_ours)))
    np.testing.assert_allclose(np.transpose(rec_ours, (0, 2, 1)), rec_ref,
                               rtol=1e-4, atol=1e-5)
