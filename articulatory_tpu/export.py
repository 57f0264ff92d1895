"""Model export for deployment outside JAX.

The reference ships TensorFlow/Keras ports of MelGAN for inference export
(articulatory/layers/tf_layers.py, models/tf_models.py — optional, lazily
imported). The TPU-native equivalent is mechanical: any generator in the zoo
can be exported through ``jax2tf`` to a TF SavedModel, or to a
StableHLO/``jax.export`` artifact with no TF dependency at all.

TensorFlow is not installed in this environment; ``to_tf_module`` is gated
accordingly, while ``to_stablehlo`` works everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_stablehlo(model, variables, example_inputs: tuple, **apply_kwargs):
    """Serialize a generator forward to a portable StableHLO artifact.

    Returns the ``jax.export.Exported`` object; ``.serialize()`` yields
    bytes loadable from any StableHLO consumer (incl. TF/TFLite toolchains).
    """
    from jax import export as jax_export

    def forward(*inputs):
        out = model.apply(variables, *inputs, **apply_kwargs)
        return out[0] if isinstance(out, tuple) else out

    exported = jax_export.export(jax.jit(forward))(
        *[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in example_inputs])
    return exported


def to_tf_module(model, variables, example_inputs: tuple, **apply_kwargs):
    """Wrap a generator as a tf.Module via jax2tf (requires tensorflow)."""
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:  # pragma: no cover - TF absent in CI env
        raise ImportError(
            "tensorflow is required for to_tf_module; use to_stablehlo for a "
            "TF-free export") from e

    def forward(*inputs):
        out = model.apply(variables, *inputs, **apply_kwargs)
        return out[0] if isinstance(out, tuple) else out

    tf_fn = tf.function(
        jax2tf.convert(forward, with_gradient=False),
        input_signature=[tf.TensorSpec(x.shape, x.dtype)
                         for x in example_inputs],
        autograph=False)
    # __call__ must live on the TYPE for the instance to be callable —
    # assigning it as an instance attribute makes `m(x)` raise TypeError
    class _ExportedModule(tf.Module):
        def __call__(self, *inputs):
            return self.f(*inputs)

    module = _ExportedModule()
    module.f = tf_fn  # named attribute also makes SavedModel export natural
    return module
