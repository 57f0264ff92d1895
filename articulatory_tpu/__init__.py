"""articulatory_tpu — TPU-native articulatory speech processing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``articulatory/articulatory`` (articulatory-to-acoustic synthesis and
acoustic-to-articulatory inversion with HiFi-GAN-family GAN vocoders,
including the chunked-autoregressive "HiFi-CAR" mode).

Design notes
------------
- All compute paths are pure-functional JAX; models are ``flax.linen``
  modules operating in NLC layout (batch, time, channels) so channels map
  onto TPU lanes and time onto sublanes.
- Convolutions match PyTorch Conv1d/ConvTranspose1d semantics exactly
  (see ``articulatory_tpu.ops.conv``) so reference checkpoints can be
  imported for quality parity.
- Parallelism is expressed with ``jax.sharding`` over a device mesh; the
  trainer jits one GAN step (generator update, fake regeneration under
  ``stop_gradient``, discriminator update) over the mesh.
"""

__version__ = "0.1.0"
