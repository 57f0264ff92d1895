"""Pitch extractor: F0 recovery on known tones + output contract."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "egs", "ema", "voc1"))

from local.pitch import frame_f0_autocorr  # noqa: E402


def test_pure_tone_f0():
    sr, hop = 16000, 80
    for f0 in (110.0, 220.0, 330.0):
        t = np.arange(sr) / sr
        wav = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        pitch, periodicity = frame_f0_autocorr(wav, sr, hop)
        assert pitch.shape == (len(wav) // hop,)
        mid = pitch[20:-20]
        # autocorrelation may lock onto a subharmonic at edges; the median
        # over steady frames must be within 3% of the target
        assert abs(np.median(mid) - f0) / f0 < 0.03, (f0, np.median(mid))
        assert np.median(periodicity[20:-20]) > 0.8


def test_silence_has_zero_periodicity():
    sr, hop = 16000, 80
    wav = np.zeros(sr, np.float32)
    wav[: sr // 2] = 0.5 * np.sin(2 * np.pi * 200 *
                                  np.arange(sr // 2) / sr).astype(np.float32)
    pitch, periodicity = frame_f0_autocorr(wav, sr, hop)
    # trailing silent half: periodicity gated to ~0
    assert np.median(periodicity[-40:]) < 0.1
    assert np.all(pitch >= 50.0) and np.all(pitch <= 550.0)
