"""convert_checkpoint CLI: reference torch pickle -> our checkpoint -> load_model."""

import os
import sys

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from conftest import requires_reference


@requires_reference
def test_convert_and_load(reference, tmp_path, monkeypatch, rng):
    import torch
    from articulatory.models import HiFiGANGenerator as RefGen

    from articulatory_tpu.bin import convert_checkpoint
    from articulatory_tpu.inference import load_model

    cfg = dict(in_channels=13, out_channels=1, channels=16, kernel_size=7,
               upsample_scales=[4, 2], upsample_kernel_sizes=[8, 4],
               resblock_kernel_sizes=[3], resblock_dilations=[[1, 3]])
    torch.manual_seed(0)
    ref = RefGen(**cfg)
    ref.eval()

    monkeypatch.chdir(tmp_path)
    torch.save({"model": {"generator": ref.state_dict()}, "steps": 77},
               "ref_ckpt.pkl")
    config = {"sampling_rate": 16000, "hop_size": 80, "format": "hdf5",
              "dataset_mode": "a2w", "generator_type": "HiFiGANGenerator",
              "generator_params": cfg}
    with open("config.yml", "w") as f:
        yaml.dump(config, f)

    monkeypatch.setattr(sys, "argv", [
        "convert", "--checkpoint", "ref_ckpt.pkl", "--config", "config.yml",
        "--out", "converted/ckpt.ckpt"])
    convert_checkpoint.main()

    model = load_model("converted/ckpt.ckpt", config)
    c = rng.standard_normal((25, 13)).astype(np.float32)
    y = model.inference(c)
    with torch.no_grad():
        y_ref = ref.inference(torch.from_numpy(c)).numpy()
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-3, atol=1e-4)
