"""LSGAN / hinge adversarial losses over discriminator output pytrees.

Parity target: reference articulatory/losses/adversarial_loss.py. Inputs are
lists of per-discriminator outputs; an element that is itself a list carries
feature maps, and only its last entry (the logits) feeds the loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _final_logits(outputs):
    if isinstance(outputs, (tuple, list)):
        return [o[-1] if isinstance(o, (tuple, list)) else o for o in outputs]
    return [outputs]


class GeneratorAdversarialLoss:
    def __init__(self, average_by_discriminators: bool = True, loss_type: str = "mse"):
        assert loss_type in ("mse", "hinge"), f"{loss_type} is not supported."
        self.average_by_discriminators = average_by_discriminators
        self.loss_type = loss_type

    def __call__(self, outputs) -> Array:
        logits = _final_logits(outputs)
        loss = 0.0
        for x in logits:
            if self.loss_type == "mse":
                loss += jnp.mean((x - 1.0) ** 2)
            else:
                loss += -jnp.mean(x)
        if self.average_by_discriminators and len(logits) > 1:
            loss /= len(logits)
        return loss


class DiscriminatorAdversarialLoss:
    def __init__(self, average_by_discriminators: bool = True, loss_type: str = "mse"):
        assert loss_type in ("mse", "hinge"), f"{loss_type} is not supported."
        self.average_by_discriminators = average_by_discriminators
        self.loss_type = loss_type

    def __call__(self, outputs_hat, outputs) -> tuple[Array, Array]:
        """Returns (real_loss, fake_loss)."""
        logits_hat = _final_logits(outputs_hat)
        logits = _final_logits(outputs)
        real_loss = 0.0
        fake_loss = 0.0
        for x_hat, x in zip(logits_hat, logits):
            if self.loss_type == "mse":
                real_loss += jnp.mean((x - 1.0) ** 2)
                fake_loss += jnp.mean(x_hat ** 2)
            else:
                real_loss += -jnp.mean(jnp.minimum(x - 1.0, 0.0))
                fake_loss += -jnp.mean(jnp.minimum(-x_hat - 1.0, 0.0))
        if self.average_by_discriminators and len(logits) > 1:
            real_loss /= len(logits)
            fake_loss /= len(logits)
        return real_loss, fake_loss
