"""Weight-norm folding (``remove_weight_norm`` parity).

The reference removes weight-norm wrappers before inference
(decode.py:279, hifigan.py:256-266). Our weight norm is a static (g, v)
reparameterization, so "removal" = rescaling v by g/||v|| (and resetting g
to the new per-slice norms), which makes the runtime recompute the *same*
effective kernel from an exactly-normalized v — numerically identical
outputs, with v now equal to the folded weight for direct inspection/export.
"""

from __future__ import annotations

import numpy as np


def _fold_entry(entry: dict) -> dict:
    if isinstance(entry["v"], dict):  # int8-quantized leaf (utils/quantize)
        return entry
    v = np.asarray(entry["v"])
    g = np.asarray(entry["g"])
    # infer norm axes from g's broadcast shape: axes where g has size 1
    axes = tuple(i for i, s in enumerate(g.shape) if s == 1)
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    w_eff = g * v / norm
    new_norm = np.sqrt(np.sum(w_eff * w_eff, axis=axes, keepdims=True))
    out = dict(entry)
    out["v"] = w_eff.astype(v.dtype)
    out["g"] = new_norm.astype(g.dtype)
    return out


def fold_weight_norm(params):
    """Recursively fold every (g, v) weight-norm pair in a param tree."""
    if isinstance(params, dict):
        if "g" in params and "v" in params:
            return _fold_entry(params)
        return {k: fold_weight_norm(v) for k, v in params.items()}
    return params
