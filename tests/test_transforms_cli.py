"""Named YAML transforms (reference transforms/transforms.py) and the
compute-mcd / model-stats CLIs."""

import os
import sys

import numpy as np
import pytest

from articulatory_tpu.data.transforms import (
    get_transform,
    preprocess_emg,
    resample_16_22,
)


def test_get_transform_resolution():
    assert get_transform("preprocess_emg") is preprocess_emg
    assert get_transform(None) is None
    with pytest.raises((KeyError, ValueError, AttributeError)):
        get_transform("nope")


def test_resample_16_22_ratio(rng):
    x = rng.standard_normal(16000).astype(np.float32) * 0.5
    y = resample_16_22(x)
    assert len(y) == 22050
    assert np.abs(y).max() <= 1.0


def test_preprocess_emg_shapes(rng):
    # 1 s of 8-channel 1 kHz EMG -> 689.06 Hz subsample
    x = rng.standard_normal((1000, 8)).astype(np.float32)
    y = preprocess_emg(x)
    assert y.shape[1] == 8
    assert abs(y.shape[0] - 689) <= 2
    assert np.all(np.isfinite(y))


def test_compute_mcd_cli(tmp_path, monkeypatch, rng):
    from articulatory_tpu.bin import compute_mcd
    from articulatory_tpu.utils.io import write_wav

    sr = 16000
    gen_dir = tmp_path / "gen"
    ref_dir = tmp_path / "ref"
    gen_dir.mkdir(), ref_dir.mkdir()
    for u in ("a", "b"):
        wav = rng.standard_normal(sr).astype(np.float32) * 0.2
        write_wav(str(ref_dir / f"{u}.wav"), wav, sr)
        write_wav(str(gen_dir / f"{u}_gen.wav"),
                  wav + rng.standard_normal(sr).astype(np.float32) * 0.02, sr)
    monkeypatch.setattr(sys, "argv", [
        "compute-mcd", "--gen-dir", str(gen_dir), "--ref-dir", str(ref_dir)])
    compute_mcd.main()  # prints per-utt + mean MCD; must not raise


def test_model_stats_cli(tmp_path, monkeypatch):
    import yaml

    from articulatory_tpu.bin import model_stats

    config = {
        "generator_type": "HiFiGANGenerator",
        "generator_params": {
            "in_channels": 13, "out_channels": 1, "channels": 16,
            "kernel_size": 7, "upsample_scales": [4, 2],
            "upsample_kernel_sizes": [8, 4], "resblock_kernel_sizes": [3],
            "resblock_dilations": [[1, 3]]},
        "hop_size": 8, "batch_max_steps": 80, "dataset_mode": "a2w",
    }
    cfg = tmp_path / "c.yaml"
    cfg.write_text(yaml.safe_dump(config))
    monkeypatch.setattr(sys, "argv", [
        "model-stats", "--config", str(cfg), "--lengths", "10", "20",
        "--iters", "1"])
    model_stats.main()  # the reference's equivalent is broken; ours must run
