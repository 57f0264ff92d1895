"""NativeDataLoader over an hdf5 dump feeding the jitted train step."""

import os
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _native_available():
    from articulatory_tpu.data import native_loader

    if native_loader.is_available():
        return True
    root = os.path.join(os.path.dirname(__file__), "..")
    try:
        subprocess.run(["cmake", "-S", os.path.join(root, "native"), "-B",
                        os.path.join(root, "native", "build")],
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", os.path.join(root, "native", "build")],
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return native_loader.is_available()


pytestmark = pytest.mark.skipif(not _native_available(),
                                reason="native toolchain unavailable")


def test_native_loader_feeds_train_step(tmp_path, monkeypatch, rng):
    from articulatory_tpu.data.native_loader import NativeDataLoader
    from articulatory_tpu.models import (
        HiFiGANGenerator,
        HiFiGANMultiScaleMultiPeriodDiscriminator,
    )
    from articulatory_tpu.train.gan import GANCriterion, GANTrainState, make_train_step
    from articulatory_tpu.train.optimizers import build_optimizer
    from articulatory_tpu.utils.io import write_hdf5

    monkeypatch.chdir(tmp_path)
    hop, steps = 80, 800
    # hdf5 dump + feats.scp layout
    os.makedirs("data/tr_set", exist_ok=True)
    os.makedirs("dump/tr_set/norm", exist_ok=True)
    os.makedirs("ema", exist_ok=True)
    with open("data/tr_set/feats.scp", "w") as scp:
        for i in range(4):
            utt = f"u{i}"
            t = 4000 + 400 * i
            wave = (rng.standard_normal(t) * 0.1).astype(np.float32)
            art = rng.standard_normal((t // hop + 5, 13)).astype(np.float32)
            write_hdf5(f"dump/tr_set/norm/{utt}.h5", "wave", wave)
            write_hdf5(f"dump/tr_set/norm/{utt}.h5", "feats",
                       rng.standard_normal((t // hop, 40)).astype(np.float32))
            np.save(f"ema/{utt}.npy", art)
            scp.write(f"{utt} ema/{utt}.npy\n")

    from articulatory_tpu.data.datasets import SpeechDataset
    from articulatory_tpu.utils.io import read_hdf5

    ds = SpeechDataset("dump/tr_set/norm", audio_query="*.h5",
                       audio_load_fn=lambda x: read_hdf5(x, "wave"),
                       mel_load_fn=lambda x: read_hdf5(x, "feats"))
    loader = NativeDataLoader(ds, batch_size=2, batch_max_steps=steps,
                              hop_size=hop, ar_len=64, n_threads=2)
    batches = list(loader)
    assert len(batches) == 2
    batch = batches[0]
    assert batch["y"].shape == (2, steps, 1)
    assert batch["x"][0].shape == (2, steps // hop, 13)
    assert batch["ar"].shape == (2, 64, 1)

    # feed the jitted GAN step
    config = {
        "dataset_mode": "a2w", "batch_max_steps": steps, "hop_size": hop,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 256, "hop_size": hop,
                            "num_mels": 20, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0,
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
    key = jax.random.PRNGKey(0)
    b = {k: (tuple(jnp.asarray(v) for v in val) if k == "x" else jnp.asarray(val))
         for k, val in batch.items() if k in ("x", "y", "ar")}
    vg = gen.init(key, b["x"][0], ar=b["ar"])
    vd = disc.init({"params": key, "window": key},
                   jnp.concatenate([b["ar"], b["y"]], axis=1))
    tx = build_optimizer("Adam", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx))
    s1, m = step(state, b, jax.random.PRNGKey(1),
                 jnp.float32(1e-4), jnp.float32(1e-4))
    assert np.isfinite(float(m["train/generator_loss"]))
