"""normalize CLI scp-driven path (reference normalize.py:112-161): features
from --feats-scp (+ audio from --wav-scp unless --skip-wav-copy), with the
either/or --rootdir validation."""

import os
import sys

import numpy as np
import pytest
import yaml

from articulatory_tpu.utils.io import read_hdf5, write_hdf5, write_wav


@pytest.fixture
def scp_corpus(tmp_path, rng):
    feats = {}
    with open(tmp_path / "feats.scp", "w") as fs, \
            open(tmp_path / "wav.scp", "w") as ws:
        for i in range(3):
            utt = f"utt{i:02d}"
            arr = rng.standard_normal((40 + i, 5)).astype(np.float32)
            h5 = str(tmp_path / f"{utt}.h5")
            write_hdf5(h5, "feats", arr)
            wav = rng.standard_normal(1600).astype(np.float32) * 0.1
            write_wav(str(tmp_path / f"{utt}.wav"), wav, 16000)
            fs.write(f"{utt} {h5}:feats\n")
            ws.write(f"{utt} {tmp_path / f'{utt}.wav'}\n")
            feats[utt] = arr
    mean = np.zeros(5, np.float32) + 0.5
    scale = np.ones(5, np.float32) * 2.0
    write_hdf5(str(tmp_path / "stats.h5"), "mean", mean)
    write_hdf5(str(tmp_path / "stats.h5"), "scale", scale)
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.dump({"format": "hdf5"}, f)
    return tmp_path, feats, mean, scale


def _run_normalize(argv, monkeypatch):
    from articulatory_tpu.bin import normalize

    monkeypatch.setattr(sys, "argv", ["normalize"] + argv)
    normalize.main()


def test_normalize_feats_scp(scp_corpus, tmp_path, monkeypatch):
    root, feats, mean, scale = scp_corpus
    out = str(tmp_path / "norm")
    _run_normalize(["--feats-scp", str(root / "feats.scp"),
                    "--wav-scp", str(root / "wav.scp"),
                    "--dumpdir", out, "--stats", str(root / "stats.h5"),
                    "--config", str(root / "cfg.yaml"), "--verbose", "0"],
                   monkeypatch)
    for utt, arr in feats.items():
        got = read_hdf5(os.path.join(out, f"{utt}.h5"), "feats")
        np.testing.assert_allclose(got, (arr - mean) / scale, atol=1e-6)
        wave = read_hdf5(os.path.join(out, f"{utt}.h5"), "wave")
        assert wave.shape == (1600,)


def test_normalize_scp_skip_wav(scp_corpus, tmp_path, monkeypatch):
    root, feats, mean, scale = scp_corpus
    out = str(tmp_path / "norm2")
    _run_normalize(["--feats-scp", str(root / "feats.scp"), "--skip-wav-copy",
                    "--dumpdir", out, "--stats", str(root / "stats.h5"),
                    "--config", str(root / "cfg.yaml"), "--verbose", "0"],
                   monkeypatch)
    assert len(os.listdir(out)) == len(feats)


def test_normalize_requires_exactly_one_source(scp_corpus, tmp_path,
                                               monkeypatch):
    root, *_ = scp_corpus
    with pytest.raises(ValueError, match="either"):
        _run_normalize(["--dumpdir", str(tmp_path / "x"),
                        "--stats", str(root / "stats.h5"),
                        "--config", str(root / "cfg.yaml"), "--verbose", "0"],
                       monkeypatch)
