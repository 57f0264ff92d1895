"""predict_wav entry point: end-to-end from a saved checkpoint (CPU)."""

import os
import sys

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp


def test_predict_wav_cli(tmp_path, monkeypatch, rng):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "egs", "ema", "voc1"))
    from local import predict_wav

    from articulatory_tpu.models import HiFiGANGenerator
    from articulatory_tpu.train.gan import GANTrainState
    from articulatory_tpu.utils.checkpoint import save_checkpoint

    monkeypatch.chdir(tmp_path)
    config = {
        "sampling_rate": 16000, "hop_size": 80, "batch_max_steps": 800,
        "dataset_mode": "a2w", "format": "hdf5",
        "generator_type": "HiFiGANGenerator",
        "generator_params": {
            "in_channels": 13 + 8, "out_channels": 1, "channels": 16,
            "kernel_size": 7, "upsample_scales": [5, 4, 2, 2],
            "upsample_kernel_sizes": [10, 8, 4, 4],
            "resblock_kernel_sizes": [3], "resblock_dilations": [[1, 3]],
            "use_ar": True, "ar_input": 64, "ar_hidden": 8, "ar_output": 8},
    }
    gen = HiFiGANGenerator(
        in_channels=21, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    c0 = jnp.zeros((1, 10, 13))
    ar0 = jnp.zeros((1, 64, 1))
    v = gen.init(jax.random.PRNGKey(0), c0, ar=ar0)
    state = GANTrainState(params_g=v["params"], params_d={"d": jnp.zeros(1)},
                          opt_g={}, opt_d={}, steps=jnp.asarray(0, jnp.int32))
    os.makedirs("exp", exist_ok=True)
    save_checkpoint("exp/ckpt.ckpt", state)
    with open("exp/config.yml", "w") as f:
        yaml.dump(config, f)

    # features: > 250 frames so the utterance is not skipped (reference
    # predict_wav.py:128-137); plus one short utterance that must be skipped
    np.save("long.npy", rng.standard_normal((300, 13)).astype(np.float32))
    np.save("short.npy", rng.standard_normal((100, 13)).astype(np.float32))
    with open("feats.scp", "w") as f:
        f.write("long long.npy\nshort short.npy\n")

    monkeypatch.setattr(sys, "argv", [
        "predict_wav", "--feats-scp", "feats.scp", "--outdir", "out",
        "--checkpoint", "exp/ckpt.ckpt", "--config", "exp/config.yml",
        "--verbose", "0"])
    predict_wav.main()

    assert os.path.exists("out/long.wav")
    assert not os.path.exists("out/short.wav")
    from articulatory_tpu.utils.io import read_wav

    wav, sr = read_wav("out/long.wav")
    assert sr == 16000
    assert len(wav) == 300 * 80
    assert np.all(np.isfinite(wav))
