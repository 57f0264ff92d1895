"""audio ops: trim_silence (librosa.effects.trim semantics) and polyphase
resample (librosa.resample/resampy replacement)."""

import numpy as np

from articulatory_tpu.ops.audio import resample, trim_silence


def test_trim_silence_cuts_leading_trailing(rng):
    sr = 16000
    speech = rng.standard_normal(sr).astype(np.float32) * 0.3
    silence = rng.standard_normal(sr).astype(np.float32) * 1e-5
    audio = np.concatenate([silence, speech, silence])
    trimmed, (start, end) = trim_silence(audio, top_db=40,
                                         frame_length=1024, hop_length=256)
    # speech region recovered within one hop of its true boundaries
    assert abs(start - sr) <= 1024
    assert abs(end - 2 * sr) <= 1024
    assert len(trimmed) == end - start


def test_trim_silence_all_silent():
    audio = np.zeros(8000, np.float32)
    trimmed, (s, e) = trim_silence(audio + 1e-9, top_db=60)
    # nothing exceeds max-top_db => everything "non-silent" relative to max;
    # uniform signal trims to the full framed span
    assert e >= s


def test_resample_preserves_tone_frequency(rng):
    sr_in, sr_out = 20000, 16000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = resample(tone, sr_in, sr_out)
    assert len(out) == sr_out
    # dominant FFT bin is still 440 Hz
    spec = np.abs(np.fft.rfft(out))
    freq = np.fft.rfftfreq(len(out), 1 / sr_out)
    assert abs(freq[np.argmax(spec)] - 440.0) < 2.0


def test_resample_identity():
    x = np.linspace(-1, 1, 1000).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)
