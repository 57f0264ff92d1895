#!/usr/bin/env python3
"""Extract pitch (F0) and periodicity tracks per utterance.

Interface parity with reference egs/ema/voc1/local/pitch.py (CARGAN-style):
writes per-utterance ``pitch/<fid>.npy`` and ``periodicity/<fid>.npy`` at
``len(audio) // hop`` frames plus global ``pitch_minmax.txt`` /
``periodicity_minmax.txt`` files consumed by combine_feats.py.

The extractor itself is re-designed: torchcrepe (a CNN pitch tracker) is
replaced by a dependency-free normalized-autocorrelation tracker (fmin 50 Hz,
fmax 550 Hz) with energy-based silence thresholding — the downstream
contract (log-domain values, [min, max] normalization at combine time) is
unchanged.

Usage: python3 local/pitch.py downloads/emadata/cin_us_mngu0 --hop 80
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from tqdm import tqdm

from articulatory_tpu.utils.io import read_wav

FMIN, FMAX = 50.0, 550.0
WIN = 1024


def frame_f0_autocorr(audio: np.ndarray, sr: int, hop: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Normalized-autocorrelation F0 + periodicity per hop frame."""
    n_frames = len(audio) // hop
    lag_min = max(2, int(sr / FMAX))
    lag_max = min(WIN - 1, int(sr / FMIN))
    pad = WIN // 2
    x = np.pad(audio.astype(np.float64), (pad, pad))
    pitch = np.zeros(n_frames)
    period = np.zeros(n_frames)
    rms_all = np.sqrt(np.mean(audio ** 2) + 1e-12)
    for i in range(n_frames):
        seg = x[i * hop: i * hop + WIN]
        seg = seg - seg.mean()
        energy = np.sqrt(np.mean(seg ** 2) + 1e-12)
        ac = np.correlate(seg, seg, mode="full")[WIN - 1:]
        if ac[0] <= 0:
            pitch[i] = FMIN
            continue
        ac = ac / ac[0]
        window = ac[lag_min:lag_max]
        best = int(np.argmax(window)) + lag_min
        pitch[i] = sr / best
        # periodicity = autocorr peak height, gated by frame energy
        p = float(max(ac[best], 0.0))
        if energy < 0.05 * rms_all:
            p = 0.0
        period[i] = p
    pitch = np.clip(pitch, FMIN, FMAX)
    return pitch.astype(np.float32), period.astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("d")
    parser.add_argument("--hop", type=int, default=110)
    args = parser.parse_args()

    subdir = args.d if os.path.exists(args.d) else os.path.join("downloads", args.d)
    wav_dir = os.path.join(subdir, "wav")
    files = sorted(f for f in os.listdir(wav_dir) if f.endswith(".wav"))
    pitch_dir = os.path.join(subdir, "pitch")
    periodicity_dir = os.path.join(subdir, "periodicity")
    os.makedirs(pitch_dir, exist_ok=True)
    os.makedirs(periodicity_dir, exist_ok=True)

    min_pitch = min_per = 1e6
    max_pitch = max_per = -1e6
    for f in tqdm(files):
        audio, sr = read_wav(os.path.join(wav_dir, f))
        pitch, periodicity = frame_f0_autocorr(audio, sr, args.hop)
        min_pitch = min(min_pitch, float(pitch.min()))
        max_pitch = max(max_pitch, float(pitch.max()))
        min_per = min(min_per, float(periodicity.min()))
        max_per = max(max_per, float(periodicity.max()))
        np.save(os.path.join(pitch_dir, f.replace(".wav", ".npy")), pitch)
        np.save(os.path.join(periodicity_dir, f.replace(".wav", ".npy")),
                periodicity)
    with open(os.path.join(subdir, "pitch_minmax.txt"), "w") as f:
        f.write(f"{min_pitch:f} {max_pitch:f}\n")
    with open(os.path.join(subdir, "periodicity_minmax.txt"), "w") as f:
        f.write(f"{min_per:f} {max_per:f}\n")


if __name__ == "__main__":
    main()
