"""interpolate_linear matches torch.nn.functional.interpolate(mode='linear',
align_corners=False) — the semantics the reference uses for PCD pitch
upsampling (train.py:334-338) and multimodal art alignment (:1172-1175)."""

import numpy as np
import torch

import jax.numpy as jnp

from articulatory_tpu.ops.interp import interpolate_linear, interpolate_linear_scale


def test_interpolate_linear_matches_torch(rng):
    for t_in, t_out in [(10, 80), (25, 800), (7, 5), (100, 100)]:
        x = rng.standard_normal((2, t_in, 3)).astype(np.float32)
        ours = np.asarray(interpolate_linear(jnp.asarray(x), t_out))
        # torch layout (B, C, T)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(np.transpose(x, (0, 2, 1))), size=t_out,
            mode="linear", align_corners=False).numpy()
        np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)),
                                   rtol=1e-5, atol=1e-6)


def test_interpolate_scale_matches_torch(rng):
    x = rng.standard_normal((1, 40, 2)).astype(np.float32)
    for scale in (2.0, 0.5, 1.75):
        ours = np.asarray(interpolate_linear_scale(jnp.asarray(x), scale))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(np.transpose(x, (0, 2, 1))), scale_factor=scale,
            mode="linear", align_corners=False).numpy()
        np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 1)),
                                   rtol=1e-5, atol=1e-6)
