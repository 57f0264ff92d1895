"""The ``transform: "10*f0"`` config hook (reference string-compare parity).

The reference passes the raw YAML string to its art datasets and
string-compares it (audio_mel_dataset.py:280-281, 644-645, 961-962, wired at
bin/train.py:1535-1556). Here the string resolves through
``get_transform`` to a callable; these tests assert channel-0 scaling
parity against the live reference datasets.
"""

import os

import numpy as np
import pytest

from articulatory_tpu.data.datasets import ArtDataset, MelArtDataset
from articulatory_tpu.data.multimodal import ArtSCPMultDataset
from articulatory_tpu.data.transforms import get_transform
from articulatory_tpu.utils.io import write_hdf5


def _make_corpus(tmp_path, rng, n_utts=3):
    """dump/tr_set/norm h5 dumps + data/tr_set/feats.scp art npys."""
    dump = tmp_path / "dump" / "tr_set" / "norm"
    dump.mkdir(parents=True)
    data = tmp_path / "data" / "tr_set"
    data.mkdir(parents=True)
    arts = {}
    with open(data / "feats.scp", "w") as scp:
        for i in range(n_utts):
            utt = f"utt{i}"
            mel = rng.standard_normal((40 + i, 24)).astype(np.float32)
            wave = rng.standard_normal(((40 + i) * 80,)).astype(np.float32)
            write_hdf5(str(dump / f"{utt}.h5"), "feats", mel)
            write_hdf5(str(dump / f"{utt}.h5"), "wave", wave)
            art = rng.standard_normal((40 + i, 13)).astype(np.float32)
            artp = data / f"{utt}.npy"
            np.save(artp, art)
            arts[utt] = art
            scp.write(f"{utt} {artp}\n")
    return arts


def test_get_transform_resolves_10f0():
    fn = get_transform("10*f0")
    art = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = fn(art)
    expect = art.copy()
    expect[:, 0] *= 10
    np.testing.assert_allclose(out, expect)
    # non-destructive (the reference mutates in place; we copy)
    np.testing.assert_allclose(art, np.arange(12, dtype=np.float32).reshape(4, 3))


@pytest.mark.parametrize("transform", [None, "10*f0"])
def test_melart_dataset_10f0_parity(tmp_path, monkeypatch, rng, reference,
                                    transform):
    arts = _make_corpus(tmp_path, rng)
    monkeypatch.chdir(str(tmp_path))
    ours = MelArtDataset("dump/tr_set/norm", return_utt_id=True,
                         transform=get_transform(transform))
    from articulatory.datasets import MelArtDataset as RefMelArtDataset

    theirs = RefMelArtDataset("dump/tr_set/norm", return_utt_id=True,
                              transform=transform)
    assert len(ours) == len(theirs) == len(arts)
    for i in range(len(ours)):
        uid, mel, art = ours[i]
        ruid, rmel, rart = theirs[i]
        assert uid == ruid
        np.testing.assert_allclose(art, rart, rtol=1e-6)
        np.testing.assert_allclose(mel, rmel, rtol=1e-6)
        if transform == "10*f0":
            np.testing.assert_allclose(art[:, 0], arts[uid][:, 0] * 10,
                                       rtol=1e-6)


def test_art_dataset_10f0(tmp_path, monkeypatch, rng):
    arts = _make_corpus(tmp_path, rng)
    monkeypatch.chdir(str(tmp_path))
    ds = ArtDataset("data/tr_set/feats.scp", return_utt_id=True,
                    transform=get_transform("10*f0"))
    for i in range(len(ds)):
        uid, art = ds[i]
        np.testing.assert_allclose(art[:, 0], arts[uid][:, 0] * 10, rtol=1e-6)
        np.testing.assert_allclose(art[:, 1:], arts[uid][:, 1:], rtol=1e-6)


@pytest.mark.parametrize("as_callable", [False, True])
def test_multimodal_scp_accepts_string_or_callable(tmp_path, rng, as_callable):
    art = rng.standard_normal((30, 13)).astype(np.float32)
    np.save(tmp_path / "u0.npy", art)
    scp = tmp_path / "feats.scp"
    scp.write_text(f"u0 {tmp_path / 'u0.npy'} 0\n")
    transform = get_transform("10*f0") if as_callable else "10*f0"
    ds = ArtSCPMultDataset(str(scp), transform=transform)
    out, mod = ds[0]
    assert mod == 0
    np.testing.assert_allclose(out[:, 0], art[:, 0] * 10, rtol=1e-6)


def test_build_datasets_accepts_10f0_config(tmp_path, monkeypatch, rng):
    """An a2m config with transform: "10*f0" must build without KeyError."""
    _make_corpus(tmp_path, rng)
    monkeypatch.chdir(str(tmp_path))
    from articulatory_tpu.bin.train import build_datasets

    class Args:
        train_dumpdir = "dump/tr_set/norm"
        dev_dumpdir = "dump/tr_set/norm"
        data_root = "data"

    config = {
        "format": "hdf5", "dataset_mode": "a2m", "transform": "10*f0",
        "batch_max_steps": 800, "hop_size": 80,
        "generator_params": {"in_channels": 13, "out_channels": 24},
        "allow_cache": False, "remove_short_samples": False,
    }
    train_ds, dev_ds, *_ = build_datasets(Args(), config)
    mel, art = train_ds[0]
    assert mel.shape[1] == 24 and art.shape[1] == 13


def test_build_datasets_10f0_a2w_never_touches_audio(tmp_path, monkeypatch,
                                                     rng):
    """a2w (SpeechDataset) with a bare ``transform: "10*f0"``: the art-only
    transform must scale the art INPUT and leave the 1-D audio OUTPUT alone
    (previously the output_transform default applied it to audio ->
    IndexError on the first item)."""
    arts = _make_corpus(tmp_path, rng)
    monkeypatch.chdir(str(tmp_path))
    from articulatory_tpu.bin.train import build_datasets

    class Args:
        train_dumpdir = "dump/tr_set/norm"
        dev_dumpdir = "dump/tr_set/norm"
        data_root = "data"

    config = {
        "format": "hdf5", "dataset_mode": "a2w", "transform": "10*f0",
        "batch_max_steps": 800, "hop_size": 80,
        "generator_params": {"in_channels": 13, "out_channels": 1},
        "allow_cache": False, "remove_short_samples": False,
    }
    train_ds, *_ = build_datasets(Args(), config)
    items = train_ds[0]
    uid = items["utt_id"] if "utt_id" in items else None
    art, audio = items["art"], items["audio"]
    assert audio.ndim == 1  # untouched waveform
    key = uid or sorted(arts)[0]
    np.testing.assert_allclose(art[:, 0], arts[key][:, 0] * 10, rtol=1e-6)
    np.testing.assert_allclose(art[:, 1:], arts[key][:, 1:], rtol=1e-6)
