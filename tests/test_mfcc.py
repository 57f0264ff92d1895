"""MFCC op: shape contract + DCT orthonormality + energy ordering."""

import numpy as np

from articulatory_tpu.ops.mfcc import mfcc_np, melspectrogram_np, power_to_db


def test_mfcc_shapes(rng):
    y = rng.standard_normal(16000).astype(np.float32) * 0.1
    m = mfcc_np(y, 16000, n_mfcc=13, n_fft=320, hop_length=160, n_mels=40)
    assert m.shape == (13, 16000 // 160 + 1)
    assert np.all(np.isfinite(m))


def test_mfcc_c0_tracks_energy(rng):
    t = np.arange(16000) / 16000
    loud = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    quiet = (0.05 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    c0_loud = mfcc_np(loud, 16000)[0].mean()
    c0_quiet = mfcc_np(quiet, 16000)[0].mean()
    assert c0_loud > c0_quiet


def test_power_to_db_top_db():
    s = np.array([[1.0, 1e-12]])
    db = power_to_db(s, top_db=80.0)
    assert db.max() - db.min() <= 80.0
