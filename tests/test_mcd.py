"""MCD metric sanity + end-to-end parity interpretation."""

import numpy as np

from articulatory_tpu.eval.mcd import mel_cepstral_distortion


def test_mcd_zero_for_identical(rng):
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    assert mel_cepstral_distortion(x, x, 16000) == 0.0


def test_mcd_positive_for_different(rng):
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    y = x + rng.standard_normal(16000).astype(np.float32) * 0.05
    v = mel_cepstral_distortion(x, y, 16000)
    assert v > 0.5


def test_mcd_dtw_handles_offset(rng):
    x = (0.2 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)).astype(np.float32)
    y = np.concatenate([np.zeros(400, np.float32), x])[:8000]
    plain = mel_cepstral_distortion(x, y, 16000)
    dtw = mel_cepstral_distortion(x, y, 16000, use_dtw=True)
    assert dtw <= plain
