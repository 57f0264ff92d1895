"""Transformer encoder layer with learned relative positions (Gaddy & Klein).

Parity targets: ``TransformerEncoderLayer`` / ``MultiHeadAttention`` /
``LearnedRelativePositionalEmbedding`` (reference:
articulatory/layers/pytorch_layers.py:128-423, fairseq-derived, unmasked
encoder flavor with per-head embeddings).

TPU notes: attention logits are computed with a single einsum per
projection; the relative-position term is computed against the
``(H, 2*maxpos-1, d)`` table and gathered into absolute (q, k) indexing with
one ``take_along_axis`` — no sequential loops.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _relative_position_logits(q: Array, table: Array, max_relative_pos: int) -> Array:
    """q: (B, H, L, d), table: (H, 2m-1, d) -> (B, H, L, L) logits."""
    m = max_relative_pos
    length = q.shape[2]
    rel_logits = jnp.einsum("bhqd,hmd->bhqm", q, table)  # (B, H, L, 2m-1)
    qi = np.arange(length)[:, None]
    ki = np.arange(length)[None, :]
    rel = ki - qi
    idx = np.clip(rel, -(m - 1), m - 1) + (m - 1)  # (L, L)
    mask = np.where(np.abs(rel) >= m, -1e8, 0.0).astype(np.float32)
    # gather per-query row: rel_logits[b,h,q,idx[q,k]]
    idx_b = jnp.asarray(idx)[None, None]  # (1, 1, L, L)
    gathered = jnp.take_along_axis(
        rel_logits, jnp.broadcast_to(idx_b, rel_logits.shape[:2] + idx.shape), axis=3)
    return gathered + jnp.asarray(mask)


class MultiHeadAttention(nn.Module):
    """Self-attention with optional learned relative positions."""

    d_model: int = 256
    n_head: int = 4
    dropout: float = 0.1
    relative_positional: bool = True
    relative_positional_distance: int = 100

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        """x: (B, L, d_model) -> (B, L, d_model)."""
        d_qkv = self.d_model // self.n_head
        assert d_qkv * self.n_head == self.d_model
        # torch xavier_normal_ semantics for 3-D tensors (reference
        # pytorch_layers.py:189-196): fan_in = size(1)*prod(dims[2:]),
        # fan_out = size(0)*prod(dims[2:])
        # w_qkv (H, D, Dq): std = sqrt(2 / (Dq * (D + H)))
        xavier = nn.initializers.normal(stddev=float(
            np.sqrt(2.0 / (d_qkv * (self.d_model + self.n_head)))))
        w_q = self.param("w_q", xavier, (self.n_head, self.d_model, d_qkv))
        w_k = self.param("w_k", xavier, (self.n_head, self.d_model, d_qkv))
        w_v = self.param("w_v", xavier, (self.n_head, self.d_model, d_qkv))
        # w_o (H, Dq, D): std = sqrt(2 / (D * (Dq + H)))
        w_o = self.param("w_o", nn.initializers.normal(stddev=float(
            np.sqrt(2.0 / (self.d_model * (d_qkv + self.n_head))))),
            (self.n_head, d_qkv, self.d_model))

        q = jnp.einsum("btf,hfa->bhta", x, w_q)
        k = jnp.einsum("btf,hfa->bhta", x, w_k)
        v = jnp.einsum("btf,hfa->bhta", x, w_v)
        logits = jnp.einsum("bhqa,bhka->bhqk", q, k) / (d_qkv ** 0.5)

        if self.relative_positional:
            m = self.relative_positional_distance
            table = self.param(
                "rel_embeddings",
                nn.initializers.normal(stddev=d_qkv ** -0.5),
                (self.n_head, 2 * m - 1, d_qkv),
            )
            logits = logits + _relative_position_logits(q, table, m)

        probs = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            probs = nn.Dropout(self.dropout, deterministic=False)(probs)
        o = jnp.einsum("bhqk,bhka->bhqa", probs, v)
        return jnp.einsum("bhta,haf->btf", o, w_o)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch-style)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    relative_positional: bool = True
    relative_positional_distance: int = 100

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        from articulatory_tpu.layers.conv import Dense

        attn = MultiHeadAttention(
            d_model=self.d_model, n_head=self.nhead, dropout=self.dropout,
            relative_positional=self.relative_positional,
            relative_positional_distance=self.relative_positional_distance,
            name="self_attn")(x, deterministic=deterministic)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout, deterministic=False)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        y = Dense(self.dim_feedforward, name="linear1")(x)
        y = jax.nn.relu(y)
        if self.dropout > 0.0 and not deterministic:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        y = Dense(self.d_model, name="linear2")(y)
        if self.dropout > 0.0 and not deterministic:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)
