"""End-to-end GAN train-step tests on tiny models (CPU, jitted)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from articulatory_tpu.models import (
    HiFiGANGenerator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)
from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_eval_step, make_train_step
from articulatory_tpu.train.optimizers import build_optimizer


def tiny_config():
    return {
        "dataset_mode": "a2w",
        "sampling_rate": 16000,
        "fft_size": 256,
        "hop_size": 80,
        "win_length": None,
        "window": "hann",
        "num_mels": 20,
        "fmin": 0,
        "fmax": 8000,
        "batch_max_steps": 800,
        "use_stft_loss": False,
        "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 256, "hop_size": 80,
                            "num_mels": 20, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": True,
        "feat_match_loss_params": {"average_by_discriminators": False,
                                   "average_by_layers": False},
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0,
        "lambda_adv": 1.0,
        "lambda_feat_match": 2.0,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": True, "ar_input": 64},
    }


@pytest.fixture(scope="module")
def setup():
    config = tiny_config()
    gen = HiFiGANGenerator(
        in_channels=13 + 16, out_channels=1, channels=32, kernel_size=7,
        upsample_scales=(5, 4, 2, 2), upsample_kernel_sizes=(10, 8, 4, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        use_ar=True, ar_input=64, ar_hidden=16, ar_output=16)
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=2,
        scale_discriminator_params={"channels": 16, "max_downsample_channels": 64,
                                    "max_groups": 4},
        periods=[2, 3],
        period_discriminator_params={"channels": 4, "max_downsample_channels": 8})

    rng = np.random.default_rng(0)
    batch = {
        "x": (jnp.asarray(rng.standard_normal((2, 10, 13)), jnp.float32),),
        "y": jnp.asarray(rng.standard_normal((2, 800, 1)) * 0.1, jnp.float32),
        "ar": jnp.asarray(rng.standard_normal((2, 64, 1)) * 0.1, jnp.float32),
    }

    key = jax.random.PRNGKey(0)
    vg = gen.init(key, batch["x"][0], ar=batch["ar"])
    vd = disc.init(key, jnp.concatenate([batch["ar"], batch["y"]], axis=1))
    tx_g = build_optimizer("Adam", {"betas": [0.5, 0.9]})
    tx_d = build_optimizer("Adam", {"betas": [0.5, 0.9]})
    state = GANTrainState(
        params_g=vg["params"], params_d=vd["params"],
        opt_g=tx_g.init(vg["params"]), opt_d=tx_d.init(vd["params"]),
        steps=jnp.asarray(0, jnp.int32))
    crit = GANCriterion(config)
    step = jax.jit(make_train_step(gen, disc, crit, config, tx_g, tx_d))
    estep = jax.jit(make_eval_step(gen, disc, crit, config))
    return config, gen, disc, state, batch, step, estep


def test_train_step_runs_and_updates(setup):
    _, _, _, state, batch, step, _ = setup
    lr = jnp.float32(1e-4)
    s1, m1 = step(state, batch, jax.random.PRNGKey(1), lr, lr)
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2), lr, lr)
    for k, v in m2.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(s2.steps) == 2
    # params changed
    d0 = jax.tree.leaves(state.params_g)[0]
    d2 = jax.tree.leaves(s2.params_g)[0]
    assert np.abs(np.asarray(d0) - np.asarray(d2)).max() > 0
    # training decreases mel loss on the same batch eventually
    s = s2
    first = float(m1["train/mel_loss"])
    for i in range(10):
        s, m = step(s, batch, jax.random.PRNGKey(3 + i), lr, lr)
    assert float(m["train/mel_loss"]) < first


def test_start_step_gating(setup):
    config, gen, disc, state, batch, _, _ = setup
    gated = dict(config)
    gated["generator_train_start_steps"] = 100
    gated["discriminator_train_start_steps"] = 100
    crit = GANCriterion(gated)
    tx = build_optimizer("Adam", {})
    step = jax.jit(make_train_step(gen, disc, crit, gated, tx, tx))
    state = state.replace(opt_g=tx.init(state.params_g),
                          opt_d=tx.init(state.params_d))
    lr = jnp.float32(1e-2)
    s1, _ = step(state, batch, jax.random.PRNGKey(0), lr, lr)
    a = np.asarray(jax.tree.leaves(state.params_g)[0])
    b = np.asarray(jax.tree.leaves(s1.params_g)[0])
    np.testing.assert_array_equal(a, b)  # gated off -> no update
    c = np.asarray(jax.tree.leaves(state.params_d)[0])
    d = np.asarray(jax.tree.leaves(s1.params_d)[0])
    np.testing.assert_array_equal(c, d)


def test_eval_step(setup):
    _, _, _, state, batch, step, estep = setup
    lr = jnp.float32(1e-4)
    s1, _ = step(state, batch, jax.random.PRNGKey(1), lr, lr)
    metrics, y_ = estep(s1, batch, jax.random.PRNGKey(9))
    assert y_.shape == batch["y"].shape
    assert np.isfinite(float(metrics["eval/mel_loss"]))
    assert np.isfinite(float(metrics["eval/discriminator_loss"]))
