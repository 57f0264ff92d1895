"""Post-training int8 weight quantization for synthesis decode.

Decode is HBM-bandwidth-bound (docs/DESIGN.md §7); int8 weights quarter the
parameter traffic vs f32 (half vs bf16). Quantization is symmetric
per-output-channel over folded (weight-norm-free) kernels:

    q = clip(round(w / s), -127, 127), s = max|w| over (K, C_in) per C_out

and the forward dequantizes ``q * s`` INSIDE jit — under ``lax.scan`` XLA
hoists the loop-invariant dequant out of the chunk loop, so the scan decode
reads int8 from HBM once; per-dispatch forwards pay one dequant each.

Quality gate: tools/int8_quality_ab.sh (same 1-ulp noise-cone protocol as
the bf16/hybrid A/Bs). The reference has no quantization story at all
(pure torch f32 — bin/decode.py:31-100); this is a TPU-native extension.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_Q = "int8_q"
_S = "int8_s"


def _is_quant_leaf(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {_Q, _S}


def quantize_params_int8(params, min_size: int = 1024):
    """Replace conv/dense kernel leaves with {int8_q, int8_s} pairs.

    Quantizes float leaves of ndim 2 (dense: (in, out)) and ndim 3 (conv:
    (K, C_in, C_out)) with at least ``min_size`` elements — biases, scalar
    gains, and tiny heads stay f32. Weight norm must be folded first
    (utils/weight_norm.fold_weight_norm): the (g, v) reparam would otherwise
    hide the effective kernel from the quantizer.
    """

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        leaf = np.asarray(node)
        if (np.issubdtype(leaf.dtype, np.floating) and leaf.ndim in (2, 3)
                and leaf.size >= min_size):
            axes = tuple(range(leaf.ndim - 1))  # all but the out-channel
            s = np.max(np.abs(leaf), axis=axes, keepdims=True) / 127.0
            s = np.maximum(s, 1e-12).astype(np.float32)
            q = np.clip(np.round(leaf / s), -127, 127).astype(np.int8)
            return {_Q: q, _S: s}
        return node

    if not isinstance(params, dict):
        import flax

        params = flax.serialization.to_state_dict(params)
    return walk(params)


def dequantize_params(params, dtype=jnp.float32):
    """Inverse of ``quantize_params_int8`` — safe to call inside jit."""

    def walk(node):
        if _is_quant_leaf(node):
            return node[_Q].astype(dtype) * node[_S].astype(dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def has_quantized_leaves(params) -> bool:
    def walk(node):
        if _is_quant_leaf(node):
            return True
        if isinstance(node, dict):
            return any(walk(v) for v in node.values())
        return False

    return walk(params)
