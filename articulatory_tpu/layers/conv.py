"""Core flax.linen conv/dense layers with PyTorch-compatible init & weight norm.

All 1-D layers run in NLC layout ``(batch, time, channels)``.

Weight norm is a static reparameterization ``w = g * v / ||v||`` with the
norm taken over the same axes as ``torch.nn.utils.weight_norm(dim=0)``:

- Conv1d weight (our layout ``(K, C_in, C_out)``): per-*output*-channel,
  norm over axes (0, 1);
- ConvTranspose1d: torch's dim=0 is the *input* channel for its
  ``(C_in, C_out, K)`` layout, so the norm runs over axes (0, 2).

Init semantics mirror the reference's *effective* inits (see
articulatory/models/hifigan.py:241-254 and layers/residual_block.py:24-28):
torch's default kaiming-uniform(a=sqrt(5)) for weight-normed generator convs
(the post-weight-norm N(0, 0.01) reset in the reference mutates a stale
tensor and is a no-op), kaiming-normal(relu) for the WaveNet stack convs,
and explicit normal inits where the reference applies them pre-weight-norm.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.ops import conv as conv_ops

Array = jax.Array
Initializer = Callable[..., Array]


# ---------------------------------------------------------------------------
# PyTorch-compatible initializers
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(fan_in_axes: Sequence[int]) -> Initializer:
    """torch default conv init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod([shape[a] for a in fan_in_axes]))
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_relu_init(fan_in_axes: Sequence[int]) -> Initializer:
    """torch.nn.init.kaiming_normal_(nonlinearity='relu'): N(0, sqrt(2/fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod([shape[a] for a in fan_in_axes]))
        std = np.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * std

    return init


def normal_init(std: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


def _resolve_kernel_init(name: str | Initializer, fan_in_axes: Sequence[int]) -> Initializer:
    if callable(name):
        return name
    if name == "torch_default":
        return torch_conv_kernel_init(fan_in_axes)
    if name == "kaiming_normal_relu":
        return kaiming_normal_relu_init(fan_in_axes)
    if name.startswith("normal:"):
        return normal_init(float(name.split(":", 1)[1]))
    if name == "zeros":
        return nn.initializers.zeros
    raise ValueError(f"Unknown kernel init: {name}")


def spectral_normalize(w: Array, out_axis: int = -1, n_iter: int = 5) -> Array:
    """Spectral normalization w / sigma_max(W).

    Deterministic power iteration from a fixed start vector (the reference's
    torch.spectral_norm carries a persistent ``u`` across steps; here the
    iteration runs to convergence-ish each call — stateless and jit-friendly.
    Gradients flow through w but not through the iteration itself).
    """
    c_out = w.shape[out_axis]
    mat = jnp.moveaxis(w, out_axis, 0).reshape(c_out, -1)
    u = jnp.ones((c_out,), w.dtype) / np.sqrt(c_out)
    m = jax.lax.stop_gradient(mat)
    for _ in range(n_iter):
        v = m.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = m @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = u @ (mat @ v)
    return w / sigma


def _weight_norm_param(module: nn.Module, shape: tuple[int, ...],
                       kernel_init: Initializer, norm_axes: tuple[int, ...]) -> Array:
    """Create (v, g) params and return the normalized weight."""
    v = module.param("v", kernel_init, shape)
    # During init, `v` is the concrete initialized array, so g == ||v|| and the
    # effective initial weight equals a plain (non-normed) init — matching torch.
    g = module.param(
        "g",
        lambda key: jnp.sqrt(jnp.sum(jnp.square(v), axis=norm_axes, keepdims=True)),
    )
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=norm_axes, keepdims=True))
    return g * v / norm


def _match_compute_dtype(x, w, b, dtype):
    """Cast (x, w, b) for the conv call. With an explicit compute ``dtype``
    everything is cast to it; with dtype None, bf16-STORED weights under an
    f32 compute layer (serve-time weight residency,
    ``LoadedModel.to_bf16_weights``) are upcast to the input dtype — the
    convert fuses into the conv read, so HBM traffic stays at the stored
    bytes. One shared rule for every conv layer."""
    if dtype is not None:
        return (x.astype(dtype), w.astype(dtype),
                b.astype(dtype) if b is not None else None)
    if w.dtype != x.dtype:
        return (x, w.astype(x.dtype),
                b.astype(x.dtype) if b is not None else None)
    return x, w, b


class Conv1d(nn.Module):
    """PyTorch-semantics Conv1d in NLC layout with optional weight norm."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int | tuple[int, int] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: str | Initializer = "torch_default"
    bias_init: str | Initializer = "torch_default"
    pad_mode: str = "zeros"  # zeros | reflect | replicate (torch pad-layer parity)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        padding = self.padding
        if self.pad_mode != "zeros" and padding != 0:
            lo, hi = (padding, padding) if isinstance(padding, int) else padding
            mode = {"reflect": "reflect", "replicate": "edge"}[self.pad_mode]
            x = jnp.pad(x, [(0, 0), (lo, hi), (0, 0)], mode=mode)
            padding = 0
        c_in = x.shape[-1]
        shape = (self.kernel_size, c_in // self.groups, self.features)
        kinit = _resolve_kernel_init(self.kernel_init, (0, 1))
        if self.use_weight_norm:
            w = _weight_norm_param(self, shape, kinit, norm_axes=(0, 1))
        else:
            w = self.param("w", kinit, shape)
        b = None
        if self.use_bias:
            fan_in = shape[0] * shape[1]
            if self.bias_init == "torch_default":
                binit = torch_bias_init(fan_in)
            elif self.bias_init == "zeros":
                binit = nn.initializers.zeros
            else:
                binit = self.bias_init
            b = self.param("b", binit, (self.features,))
        x, w, b = _match_compute_dtype(x, w, b, self.dtype)
        return conv_ops.conv1d(x, w, b, stride=self.stride, padding=padding,
                               dilation=self.dilation, groups=self.groups)


class ConvTranspose1d(nn.Module):
    """PyTorch-semantics ConvTranspose1d in NLC layout with optional weight norm.

    Weight stored as ``(K, C_in, C_out)`` pre-flipped (see ops.conv).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: str | Initializer = "torch_default"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        shape = (self.kernel_size, c_in, self.features)
        # torch fan_in for ConvT weight (C_in, C_out, K) = C_out * K
        kinit = _resolve_kernel_init(self.kernel_init, (0, 2))
        if self.use_weight_norm:
            # torch weight_norm(dim=0) on (C_in, C_out, K): per input channel
            w = _weight_norm_param(self, shape, kinit, norm_axes=(0, 2))
        else:
            w = self.param("w", kinit, shape)
        b = None
        if self.use_bias:
            fan_in = self.kernel_size * self.features
            b = self.param("b", torch_bias_init(fan_in), (self.features,))
        x, w, b = _match_compute_dtype(x, w, b, self.dtype)
        return conv_ops.conv_transpose1d(
            x, w, b, stride=self.stride, padding=self.padding,
            output_padding=self.output_padding, dilation=self.dilation)


class Conv2d(nn.Module):
    """PyTorch-semantics Conv2d in NHWC layout with optional weight norm."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    dilation: tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    use_spectral_norm: bool = False
    kernel_init: str | Initializer = "torch_default"
    dtype: Any = None  # compute dtype; params stay f32 (see Conv1d)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        shape = self.kernel_size + (c_in // self.groups, self.features)
        kinit = _resolve_kernel_init(self.kernel_init, (0, 1, 2))
        if self.use_weight_norm:
            # torch dim=0 on (C_out, C_in, Kh, Kw): per output channel
            w = _weight_norm_param(self, shape, kinit, norm_axes=(0, 1, 2))
        else:
            w = self.param("w", kinit, shape)
            if self.use_spectral_norm:
                w = spectral_normalize(w)
        b = None
        if self.use_bias:
            fan_in = int(np.prod(shape[:3]))
            b = self.param("b", torch_bias_init(fan_in), (self.features,))
        x, w, b = _match_compute_dtype(x, w, b, self.dtype)
        return conv_ops.conv2d(x, w, b, stride=self.stride, padding=self.padding,
                               dilation=self.dilation, groups=self.groups)


class Dense(nn.Module):
    """torch.nn.Linear-compatible dense layer (default torch init)."""

    features: int
    use_bias: bool = True
    kernel_init: str | Initializer = "torch_default"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        if self.kernel_init == "torch_default":
            kinit = torch_conv_kernel_init((0,))
        else:
            kinit = _resolve_kernel_init(self.kernel_init, (0,))
        w = self.param("w", kinit, (c_in, self.features))
        y = x @ w
        if self.use_bias:
            b = self.param("b", torch_bias_init(c_in), (self.features,))
            y = y + b
        return y


class Embed(nn.Module):
    """torch.nn.Embedding-compatible lookup (N(0,1) init)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids: Array) -> Array:
        table = self.param("w", nn.initializers.normal(stddev=1.0),
                           (self.num_embeddings, self.features))
        return jnp.take(table, ids, axis=0)


class CausalConv1d(nn.Module):
    """Causal Conv1d: left-pad by (K-1)*dilation then trim (reference:
    articulatory/layers/causal_conv.py:12-42)."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    use_weight_norm: bool = False
    pad_value: float = 0.0
    kernel_init: str | Initializer = "torch_default"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = (self.kernel_size - 1) * self.dilation
        x = jnp.pad(x, [(0, 0), (pad, 0), (0, 0)], constant_values=self.pad_value)
        return Conv1d(self.features, self.kernel_size, dilation=self.dilation,
                      use_bias=self.use_bias, use_weight_norm=self.use_weight_norm,
                      kernel_init=self.kernel_init, name="conv")(x)


class CausalConvTranspose1d(nn.Module):
    """Causal ConvTranspose1d: upsample then trim to T*stride (reference:
    articulatory/layers/causal_conv.py:45-66)."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: str | Initializer = "torch_default"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # reference trims the trailing `stride` samples (causal_conv.py:66)
        y = ConvTranspose1d(self.features, self.kernel_size, stride=self.stride,
                            use_bias=self.use_bias,
                            use_weight_norm=self.use_weight_norm,
                            kernel_init=self.kernel_init, name="deconv")(x)
        return y[:, : -self.stride, :]
