"""a2m mode end-to-end: MelArtDataset + CollaterMelArt through bin/train."""

import os
import sys

import numpy as np
import pytest
import yaml


def test_a2m_training(tmp_path, monkeypatch, rng):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_e2e_pipeline import HOP, SR, make_corpus

    monkeypatch.chdir(str(tmp_path))
    make_corpus(str(tmp_path), rng)

    config = {
        "sampling_rate": SR, "fft_size": 256, "hop_size": HOP,
        "win_length": None, "window": "hann", "num_mels": 24,
        "fmin": 80, "fmax": 7600, "global_gain_scale": 1.0,
        "trim_silence": False, "format": "hdf5", "dataset_mode": "a2m",
        "generator_type": "BiGRU",
        "generator_params": {"in_channels": 13, "hidden_size": 16,
                             "out_channels": 24},
        "discriminator_type": "ParallelWaveGANDiscriminator",
        "discriminator_params": {"in_channels": 24, "layers": 3,
                                 "conv_channels": 8},
        "use_stft_loss": False, "use_mel_loss": True,  # L1 on features (a2m)
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 1.0, "lambda_adv": 0.1,
        "batch_size": 2, "batch_max_steps": 800, "pin_memory": False,
        "num_workers": 0, "remove_short_samples": False, "allow_cache": True,
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9],
                                       "weight_decay": 0.0},
        "generator_scheduler_type": "MultiStepLR",
        "generator_scheduler_params": {"gamma": 0.5, "milestones": [100]},
        "generator_grad_norm": -1,
        "discriminator_optimizer_type": "Adam",
        "discriminator_optimizer_params": {"lr": 1e-3, "betas": [0.5, 0.9],
                                           "weight_decay": 0.0},
        "discriminator_scheduler_type": "MultiStepLR",
        "discriminator_scheduler_params": {"gamma": 0.5, "milestones": [100]},
        "discriminator_grad_norm": -1,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "train_max_steps": 3, "save_interval_steps": 3,
        "eval_interval_steps": 3, "log_interval_steps": 1,
        "num_save_intermediate_results": 1,
    }
    with open("a2m.yaml", "w") as f:
        yaml.dump(config, f)

    from articulatory_tpu.bin import compute_statistics, normalize, preprocess
    from articulatory_tpu.bin import train as train_bin

    for name in ("tr_set", "dev_set"):
        monkeypatch.setattr(sys, "argv", [
            "preprocess", "--wav-scp", f"data/{name}/wav.scp",
            "--dumpdir", f"dump/{name}/raw", "--config", "a2m.yaml",
            "--verbose", "0"])
        preprocess.main()
    monkeypatch.setattr(sys, "argv", [
        "compute_statistics", "--rootdir", "dump/tr_set/raw",
        "--config", "a2m.yaml", "--dumpdir", "dump/tr_set", "--verbose", "0"])
    compute_statistics.main()
    for name in ("tr_set", "dev_set"):
        monkeypatch.setattr(sys, "argv", [
            "normalize", "--rootdir", f"dump/{name}/raw",
            "--dumpdir", f"dump/{name}/norm", "--stats", "dump/tr_set/stats.h5",
            "--config", "a2m.yaml", "--verbose", "0"])
        normalize.main()

    monkeypatch.setattr(sys, "argv", [
        "train", "--train-dumpdir", "dump/tr_set/norm",
        "--dev-dumpdir", "dump/dev_set/norm", "--outdir", "exp/a2m",
        "--config", "a2m.yaml", "--verbose", "0"])
    train_bin.main()
    assert any(f.endswith(".ckpt") for f in os.listdir("exp/a2m"))
