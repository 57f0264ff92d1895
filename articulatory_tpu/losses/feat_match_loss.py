"""Feature-matching L1 over discriminator feature maps.

Parity target: reference articulatory/losses/feat_match_loss.py. Groundtruth
feature maps are treated as constants (stop_gradient ≡ .detach()).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


class FeatureMatchLoss:
    def __init__(self, average_by_layers: bool = True,
                 average_by_discriminators: bool = True,
                 include_final_outputs: bool = False):
        self.average_by_layers = average_by_layers
        self.average_by_discriminators = average_by_discriminators
        self.include_final_outputs = include_final_outputs

    def __call__(self, feats_hat, feats) -> Array:
        loss = 0.0
        for fh, f in zip(feats_hat, feats):
            if not self.include_final_outputs:
                fh = fh[:-1]
                f = f[:-1]
            disc_loss = 0.0
            for a, b in zip(fh, f):
                disc_loss += jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
            if self.average_by_layers and len(fh) > 0:
                disc_loss /= len(fh)
            loss += disc_loss
        if self.average_by_discriminators and len(feats_hat) > 0:
            loss /= len(feats_hat)
        return loss
