"""bfloat16 discriminator compute path (mixed-precision training option).

compute_dtype runs the MSMPD conv stacks in bf16 while params stay f32 and
every returned feature map / logit is cast back to f32 (loss math and
feature matching stay full precision). Configured per discriminator via
``discriminator_params: {compute_dtype: bfloat16}`` (build_model resolves
dtype strings).
"""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.models import (
    HiFiGANMultiScaleMultiPeriodDiscriminator,
    build_model,
)

CFG = dict(scales=2,
           scale_discriminator_params={"channels": 16,
                                       "max_downsample_channels": 32,
                                       "max_groups": 4},
           periods=[2, 3],
           period_discriminator_params={"channels": 4,
                                        "max_downsample_channels": 8})


def test_bf16_disc_outputs_close_to_f32(rng):
    x = jnp.asarray(rng.standard_normal((2, 512, 1)) * 0.3, jnp.float32)
    f32 = HiFiGANMultiScaleMultiPeriodDiscriminator(**CFG)
    bf16 = HiFiGANMultiScaleMultiPeriodDiscriminator(
        **CFG, compute_dtype=jnp.bfloat16)
    params = f32.init(jax.random.PRNGKey(0), x)["params"]
    # params are f32 regardless of compute dtype (same init tree works)
    assert all(leaf.dtype == jnp.float32
               for leaf in jax.tree.leaves(params))
    outs_f32 = f32.apply({"params": params}, x)
    outs_bf16 = bf16.apply({"params": params}, x)
    assert len(outs_f32) == len(outs_bf16)
    for fo, fb in zip(outs_f32, outs_bf16):
        for a, b in zip(fo, fb):
            assert np.asarray(b).dtype == np.float32  # fmaps cast back
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.1, atol=0.05)


def test_bf16_disc_gradients_finite(rng):
    x = jnp.asarray(rng.standard_normal((2, 512, 1)) * 0.3, jnp.float32)
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        **CFG, compute_dtype=jnp.bfloat16)
    params = disc.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        outs = disc.apply({"params": p}, x)
        return sum(jnp.mean((o[-1] - 1.0) ** 2) for o in outs)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(leaf.dtype == jnp.float32 for leaf in leaves)
    assert all(np.all(np.isfinite(np.asarray(leaf))) for leaf in leaves)
    assert any(np.any(np.asarray(leaf) != 0) for leaf in leaves)


def test_build_model_resolves_dtype_strings():
    disc = build_model("HiFiGANMultiScaleMultiPeriodDiscriminator",
                       {**CFG, "compute_dtype": "bfloat16"})
    assert disc.compute_dtype == jnp.bfloat16
    # nested placement (per-sub-discriminator override) resolves too
    disc = build_model(
        "HiFiGANMultiScaleMultiPeriodDiscriminator",
        {**CFG, "period_discriminator_params": {
            **CFG["period_discriminator_params"], "compute_dtype": "bf16"}})
    assert disc.period_discriminator_params["compute_dtype"] == jnp.bfloat16
