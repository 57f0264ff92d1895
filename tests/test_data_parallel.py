"""Data-parallel correctness: training on an 8-device mesh produces the same
parameters as single-device training on the same global batch (XLA inserts
the gradient all-reduce; losses are batch means, so results must agree)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from articulatory_tpu.models import (
    HiFiGANGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def _setup(rng):
    config = {
        "dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 256, "hop_size": 80,
                            "num_mels": 20, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": True,
        "feat_match_loss_params": {"average_by_discriminators": False,
                                   "average_by_layers": False},
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0, "lambda_feat_match": 2.0,
        "generator_train_start_steps": 0, "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": True, "ar_input": 64},
    }
    gen = HiFiGANGenerator(in_channels=13 + 8, channels=16,
                           upsample_scales=(5, 4, 2, 2),
                           upsample_kernel_sizes=(10, 8, 4, 4),
                           resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
                           use_ar=True, ar_input=64, ar_hidden=8, ar_output=8)
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1, scale_discriminator_params={"channels": 8,
                                              "max_downsample_channels": 16,
                                              "max_groups": 2},
        periods=[2], period_discriminator_params={"channels": 2,
                                                  "max_downsample_channels": 4})
    B = 8
    batch = {
        "x": (jnp.asarray(rng.standard_normal((B, 10, 13)), jnp.float32),),
        "y": jnp.asarray(rng.standard_normal((B, 800, 1)) * 0.1, jnp.float32),
        "ar": jnp.asarray(rng.standard_normal((B, 64, 1)) * 0.1, jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, batch["x"][0], ar=batch["ar"])
    vd = disc.init({"params": key, "window": key},
                   jnp.concatenate([batch["ar"], batch["y"]], axis=1))
    # plain SGD: params' = params - lr * grad, so the comparison directly
    # checks the all-reduced gradients (Adam's g/sqrt(v) early-step dynamics
    # amplify benign reduction-order noise into sign flips)
    tx = build_optimizer("SGD", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    crit = GANCriterion(config)
    step = jax.jit(make_train_step(gen, disc, crit, config, tx, tx))
    return state, batch, step


def _run(state, batch, step, mesh):
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        batch)
    lr = jnp.float32(1e-3)
    # a single step bounds the diff by lr * (gradient reduction-order noise);
    # a second adversarial step would amplify near-zero elements nonlinearly
    for i in range(1):
        state, metrics = step(state, batch, jax.random.PRNGKey(7 + i), lr, lr)
    return jax.device_get(state), metrics


def test_dp8_matches_single_device(rng):
    assert len(jax.devices()) >= 8, "conftest provides 8 CPU devices"
    state, batch, step = _setup(rng)

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    mesh8 = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    s1, m1 = _run(state, batch, step, mesh1)
    s8, m8 = _run(state, batch, step, mesh8)

    np.testing.assert_allclose(float(m1["train/generator_loss"]),
                               float(m8["train/generator_loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params_g), jax.tree.leaves(s8.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
    for a, b in zip(jax.tree.leaves(s1.params_d), jax.tree.leaves(s8.params_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
