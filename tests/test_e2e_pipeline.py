"""Full-pipeline integration test: preprocess -> stats -> normalize -> train
-> decode on a tiny synthetic EMA-to-wave corpus (the e2w_hifigan recipe in
miniature)."""

import os
import sys

import numpy as np
import pytest
import yaml

SR = 16000
HOP = 80
N_UTT = 4
UTT_SECONDS = 1.0


def make_corpus(root, rng):
    """Create wavs + EMA npys + kaldi-style data dir."""
    from articulatory_tpu.utils.io import write_wav

    os.makedirs(f"{root}/wavs", exist_ok=True)
    for name in ("tr", "dev"):
        os.makedirs(f"{root}/data/{name}_set", exist_ok=True)
    os.makedirs(f"{root}/ema", exist_ok=True)

    entries = {"tr": [], "dev": []}
    for i in range(N_UTT):
        utt = f"utt{i:02d}"
        t = np.arange(int(SR * UTT_SECONDS)) / SR
        f0 = 120 + 30 * i
        wav = 0.3 * np.sin(2 * np.pi * f0 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
        wav += 0.01 * rng.standard_normal(len(t))
        write_wav(f"{root}/wavs/{utt}.wav", wav, SR)
        n_frames = len(wav) // HOP + 10
        ema = rng.standard_normal((n_frames, 13)).astype(np.float32)
        np.save(f"{root}/ema/{utt}.npy", ema)
        entries["tr" if i < N_UTT - 1 else "dev"].append(utt)

    for name, utts in entries.items():
        with open(f"{root}/data/{name}_set/wav.scp", "w") as f:
            for utt in utts:
                f.write(f"{utt} {root}/wavs/{utt}.wav\n")
        with open(f"{root}/data/{name}_set/feats.scp", "w") as f:
            for utt in utts:
                f.write(f"{utt} {root}/ema/{utt}.npy\n")
    return entries


def tiny_yaml(root):
    config = {
        "sampling_rate": SR, "fft_size": 256, "hop_size": HOP,
        "win_length": None, "window": "hann", "num_mels": 40,
        "fmin": 80, "fmax": 7600, "global_gain_scale": 1.0,
        "trim_silence": False, "format": "hdf5", "dataset_mode": "a2w",
        "generator_type": "HiFiGANGenerator",
        "generator_params": {
            "in_channels": 29, "out_channels": 1, "channels": 32,
            "kernel_size": 7, "upsample_scales": [5, 4, 2, 2],
            "upsample_kernel_sizes": [10, 8, 4, 4],
            "resblock_kernel_sizes": [3], "resblock_dilations": [[1, 3]],
            "use_ar": True, "ar_input": 64, "ar_hidden": 16, "ar_output": 16,
        },
        "discriminator_type": "HiFiGANMultiScaleMultiPeriodDiscriminator",
        "discriminator_params": {
            "scales": 2,
            "scale_discriminator_params": {"channels": 16,
                                           "max_downsample_channels": 32,
                                           "max_groups": 4},
            "periods": [2, 3],
            "period_discriminator_params": {"channels": 4,
                                            "max_downsample_channels": 16},
            "follow_official_norm": True,
        },
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": SR, "fft_size": 256, "hop_size": HOP,
                            "num_mels": 40, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": True,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0, "lambda_feat_match": 2.0,
        "batch_size": 2, "batch_max_steps": 800, "pin_memory": False,
        "num_workers": 0, "remove_short_samples": False, "allow_cache": True,
        "generator_optimizer_type": "Adam",
        "generator_optimizer_params": {"lr": 1.0e-4, "betas": [0.5, 0.9],
                                       "weight_decay": 0.0},
        "generator_scheduler_type": "MultiStepLR",
        "generator_scheduler_params": {"gamma": 0.5, "milestones": [100]},
        "generator_grad_norm": -1,
        "discriminator_optimizer_type": "Adam",
        "discriminator_optimizer_params": {"lr": 1.0e-4, "betas": [0.5, 0.9],
                                           "weight_decay": 0.0},
        "discriminator_scheduler_type": "MultiStepLR",
        "discriminator_scheduler_params": {"gamma": 0.5, "milestones": [100]},
        "discriminator_grad_norm": -1,
        "generator_train_start_steps": 0,
        "discriminator_train_start_steps": 0,
        "train_max_steps": 3, "save_interval_steps": 2,
        "eval_interval_steps": 2, "log_interval_steps": 1,
        "num_save_intermediate_results": 1,
    }
    path = f"{root}/tiny.yaml"
    with open(path, "w") as f:
        yaml.dump(config, f)
    return path


@pytest.mark.filterwarnings("ignore")
def test_full_pipeline(tmp_path, monkeypatch, rng):
    root = str(tmp_path)
    monkeypatch.chdir(root)
    make_corpus(root, rng)
    cfg = tiny_yaml(root)

    from articulatory_tpu.bin import compute_statistics, decode, normalize, preprocess
    from articulatory_tpu.bin import train as train_bin

    # stage 1: preprocess both sets
    for name in ("tr_set", "dev_set"):
        monkeypatch.setattr(sys, "argv", [
            "preprocess", "--wav-scp", f"data/{name.replace('_set','')}_set/wav.scp"
            if False else f"data/{name}/wav.scp",
            "--dumpdir", f"dump/{name}/raw", "--config", cfg, "--verbose", "0"])
        preprocess.main()
    monkeypatch.setattr(sys, "argv", [
        "compute_statistics", "--rootdir", "dump/tr_set/raw", "--config", cfg,
        "--dumpdir", "dump/tr_set", "--verbose", "0"])
    compute_statistics.main()
    for name in ("tr_set", "dev_set"):
        monkeypatch.setattr(sys, "argv", [
            "normalize", "--rootdir", f"dump/{name}/raw",
            "--dumpdir", f"dump/{name}/norm", "--stats", "dump/tr_set/stats.h5",
            "--config", cfg, "--verbose", "0"])
        normalize.main()
    assert os.path.exists("dump/tr_set/norm/utt00.h5")

    # stage 2: train 3 steps
    monkeypatch.setattr(sys, "argv", [
        "train", "--train-dumpdir", "dump/tr_set/norm",
        "--dev-dumpdir", "dump/dev_set/norm", "--outdir", "exp/tiny",
        "--config", cfg, "--verbose", "0"])
    train_bin.main()
    assert os.path.exists("exp/tiny/config.yml")
    ckpts = [f for f in os.listdir("exp/tiny") if f.endswith(".ckpt")]
    assert ckpts, "no checkpoint saved"

    # stage 3: decode with the trained model (AR loop path)
    ckpt = sorted(ckpts)[-1]
    monkeypatch.setattr(sys, "argv", [
        "decode", "--feats-scp", "data/dev_set/feats.scp",
        "--checkpoint", f"exp/tiny/{ckpt}", "--config", "exp/tiny/config.yml",
        "--outdir", "out", "--verbose", "0"])
    decode.main()
    wavs = [f for f in os.listdir("out") if f.endswith("_gen.wav")]
    assert len(wavs) == 1
    from articulatory_tpu.utils.io import read_wav

    wav, sr = read_wav(os.path.join("out", wavs[0]))
    assert sr == SR
    assert len(wav) > 0 and np.all(np.isfinite(wav))

    # stage 3b: same decode through the compiled-scan CLI path (--ar-scan);
    # must match the host-loop decode sample for sample
    monkeypatch.setattr(sys, "argv", [
        "decode", "--feats-scp", "data/dev_set/feats.scp",
        "--checkpoint", f"exp/tiny/{ckpt}", "--config", "exp/tiny/config.yml",
        "--outdir", "out_scan", "--ar-scan", "--verbose", "0"])
    decode.main()
    wav_scan, sr_scan = read_wav(os.path.join("out_scan", wavs[0]))
    assert sr_scan == SR
    np.testing.assert_allclose(wav_scan, wav, atol=2e-4)

    # stage 3c: batched lanes (--decode-batch-size) with and without the
    # one-dispatch scan (--ar-scan); the two lane paths must agree
    for outdir, extra in (("out_lanes", []), ("out_lanes_scan", ["--ar-scan"])):
        monkeypatch.setattr(sys, "argv", [
            "decode", "--feats-scp", "data/tr_set/feats.scp",
            "--checkpoint", f"exp/tiny/{ckpt}",
            "--config", "exp/tiny/config.yml", "--outdir", outdir,
            "--decode-batch-size", "2", "--verbose", "0"] + extra)
        decode.main()
    lane_wavs = sorted(f for f in os.listdir("out_lanes")
                       if f.endswith("_gen.wav"))
    assert len(lane_wavs) == N_UTT - 1
    for f in lane_wavs:
        w_loop, _ = read_wav(os.path.join("out_lanes", f))
        w_scan, _ = read_wav(os.path.join("out_lanes_scan", f))
        np.testing.assert_allclose(w_scan, w_loop, atol=2e-4)
