"""tools/make_synth_corpus.py: the reproducible demo-corpus generator must
emit MNGU0-layout data that the pipeline CLIs accept (wav.scp/feats.scp,
16 kHz audio, (T, 13) float32 features at exactly hop 80)."""

import os
import subprocess
import sys
import wave

import numpy as np

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "make_synth_corpus.py")


def _run(root, seed=3):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, TOOL, "--root", str(root), "--n-utts", "3",
         "--dev-utts", "1", "--seed", str(seed), "--min-seconds", "0.5",
         "--max-seconds", "1.0"],
        check=True, env=env, capture_output=True)


def test_layout_and_alignment(tmp_path):
    _run(tmp_path / "c")
    root = tmp_path / "c"
    with open(root / "data" / "tr_set" / "wav.scp") as f:
        tr = [l.split() for l in f]
    with open(root / "data" / "dev_set" / "feats.scp") as f:
        dev = [l.split() for l in f]
    assert len(tr) == 2 and len(dev) == 1
    utt, wav_path = tr[0][0], tr[0][1]
    feats = np.load(str(root / "feats" / f"{utt}.npy"))
    assert feats.dtype == np.float32 and feats.shape[1] == 13
    with wave.open(wav_path) as w:
        assert w.getframerate() == 16000
        # feature frames must cover the audio at hop 80 (200 Hz)
        assert abs(w.getnframes() / 80 - feats.shape[0]) <= 2
    f0 = feats[:, -1]
    assert (f0 > 0).mean() > 0.3  # mostly voiced
    assert np.exp(f0[f0 > 0]).max() < 300  # plausible Hz range


def test_deterministic(tmp_path):
    _run(tmp_path / "a")
    _run(tmp_path / "b")
    a = np.load(str(tmp_path / "a" / "feats" / "synth0000.npy"))
    b = np.load(str(tmp_path / "b" / "feats" / "synth0000.npy"))
    np.testing.assert_array_equal(a, b)


def test_mri_profile_layout(tmp_path):
    """--profile mri emits the MRI recipe's shapes (egs/mri/voc1/conf/
    mri2w_hifigan_car.yaml): 20 kHz audio, (T, 230) float32 features at
    exactly hop 240 (in_channels 358 = 230 + ar_output 128)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    root = tmp_path / "m"
    subprocess.run(
        [sys.executable, TOOL, "--root", str(root), "--n-utts", "2",
         "--dev-utts", "1", "--seed", "5", "--min-seconds", "0.5",
         "--max-seconds", "1.0", "--profile", "mri"],
        check=True, env=env, capture_output=True)
    feats = np.load(str(root / "feats" / "synth0000.npy"))
    assert feats.dtype == np.float32 and feats.shape[1] == 230
    with open(root / "data" / "tr_set" / "wav.scp") as f:
        wav_path = f.readline().split()[1]
    with wave.open(wav_path) as w:
        assert w.getframerate() == 20000
        assert abs(w.getnframes() / 240 - feats.shape[0]) <= 2
    # expanded pixel-like dims are correlated with their mel sources but
    # not constant multiples of each other
    corr = np.corrcoef(feats[:, :229].T)
    assert np.isfinite(corr).all()
    f0 = feats[:, -1]
    assert (f0 > 0).mean() > 0.3
