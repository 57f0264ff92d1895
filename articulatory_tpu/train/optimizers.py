"""Optimizers: torch class names from YAML -> optax transformation chains.

Parity note: the learning rate is NOT baked into the chain — the trainer
passes the current lr into the jitted step (supports every torch scheduler,
including metric-driven ReduceLROnPlateau, without retracing). torch-Adam
weight decay is L2-in-gradient (applied before the moment update); AdamW is
decoupled (applied after).
"""

from __future__ import annotations

import optax


def build_optimizer(name: str, params: dict | None = None,
                    grad_norm: float = -1) -> optax.GradientTransformation:
    """Build the lr-free part of the update: [clip] -> optimizer scaling."""
    params = dict(params or {})
    params.pop("lr", None)  # lr is injected per-step by the trainer
    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))

    wd = params.get("weight_decay", 0.0)
    if name in ("Adam", "RAdam"):
        b1, b2 = params.get("betas", (0.9, 0.999))
        eps = params.get("eps", 1e-8)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if name == "Adam":
            chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        else:
            chain.append(optax.scale_by_radam(b1=b1, b2=b2, eps=eps))
    elif name == "AdamW":
        b1, b2 = params.get("betas", (0.9, 0.999))
        eps = params.get("eps", 1e-8)
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        chain.append(optax.add_decayed_weights(params.get("weight_decay", 1e-2)))
    elif name == "SGD":
        momentum = params.get("momentum", 0.0)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        if momentum:
            chain.append(optax.trace(decay=momentum,
                                     nesterov=params.get("nesterov", False)))
    else:
        raise ValueError(f"Unsupported optimizer: {name}")
    return optax.chain(*chain) if chain else optax.identity()
