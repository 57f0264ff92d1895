"""Parity tests: ops.conv vs torch.nn.functional (golden oracle, CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from articulatory_tpu.ops import conv1d, conv_transpose1d
from articulatory_tpu.ops.conv import conv2d


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 0, 1, 1),
    (1, 3, 1, 1),
    (2, 1, 1, 1),
    (1, 2, 2, 1),
    (1, 7, 3, 1),
    (2, 20, 1, 4),
])
def test_conv1d_matches_torch(rng, stride, padding, dilation, groups):
    b, cin, cout, t, k = 2, 8, 12, 50, 5
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin // groups, cout)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    y = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
               stride=stride, padding=padding, dilation=dilation, groups=groups)

    # torch weight layout (C_out, C_in // groups, K)
    wt = torch.from_numpy(np.transpose(w, (2, 1, 0)).copy())
    yt = F.conv1d(torch.from_numpy(np.transpose(x, (0, 2, 1)).copy()), wt,
                  torch.from_numpy(bias), stride=stride, padding=padding,
                  dilation=dilation, groups=groups)
    yt = yt.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding,output_padding,k", [
    (1, 0, 0, 4),
    (2, 1, 0, 4),
    (5, 3, 1, 10),
    (4, 2, 0, 8),
    (2, 1, 1, 4),
    (8, 4, 0, 16),
    (3, 2, 1, 6),
])
def test_conv_transpose1d_matches_torch(rng, stride, padding, output_padding, k):
    b, cin, cout, t = 2, 6, 9, 25
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    # torch layout (C_in, C_out, K)
    wt = rng.standard_normal((cin, cout, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    # our layout: (K, C_in, C_out), time-flipped
    w = np.transpose(wt[:, :, ::-1], (2, 0, 1)).copy()
    y = conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
                         stride=stride, padding=padding, output_padding=output_padding)

    yt = F.conv_transpose1d(torch.from_numpy(np.transpose(x, (0, 2, 1)).copy()),
                            torch.from_numpy(wt), torch.from_numpy(bias),
                            stride=stride, padding=padding,
                            output_padding=output_padding)
    yt = yt.permute(0, 2, 1).numpy()
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,padding", [((1, 1), (0, 0)), ((3, 1), (2, 0))])
def test_conv2d_matches_torch(rng, stride, padding):
    b, cin, cout, h, w_, kh, kw = 2, 3, 5, 20, 7, 5, 3
    x = rng.standard_normal((b, h, w_, cin)).astype(np.float32)
    w = rng.standard_normal((kh, kw, cin, cout)).astype(np.float32)
    y = conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride, padding=padding)
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    yt = F.conv2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()), wt,
                  stride=stride, padding=padding)
    yt = yt.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-4)
