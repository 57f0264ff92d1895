#!/usr/bin/env python3
"""Generate a synthetic speech-like EMA-to-wave corpus in MNGU0 layout.

Reproducible stand-in for the MNGU0 corpus used by the reference recipe
(egs/ema/voc1, reference run.sh stage 0 / local/mk_ema_feats.py): this
zero-egress environment has no real EMA data, so the convergence and
generalization demos train on audio synthesized here, with articulatory-
style features *derived from the audio itself* (12 log-mel band energies
+ log-f0 at 200 Hz) so the feature->waveform mapping is genuinely
learnable and dev-set MCD measures generalization, not memorization.

Writes:
  <root>/wavs/<utt>.wav             16 kHz PCM
  <root>/feats/<utt>.npy            (T, 13) float32 @ 200 Hz
  <root>/data/{tr,dev}_set/{wav.scp,feats.scp}

Usage:
  python tools/make_synth_corpus.py --root /tmp/corpus --n-utts 600
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.signal import lfilter

SR = 16000
HOP = 80          # 200 Hz frame rate, matching e2w_hifigan.yaml
N_MELS = 12


def synth_utterance(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """Speech-like signal: glottal-ish harmonic source with a wandering f0,
    a cascade of time-varying formant resonators, amplitude envelope with
    pauses, and unvoiced noise bursts."""
    n = int(seconds * SR)
    t = np.arange(n) / SR

    # f0 contour: smoothed random walk in log space, 80-250 Hz
    n_ctrl = max(4, int(seconds * 3))
    ctrl = rng.uniform(np.log(90.0), np.log(230.0), n_ctrl)
    f0 = np.exp(np.interp(np.linspace(0, 1, n), np.linspace(0, 1, n_ctrl), ctrl))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    # harmonic-rich source (soft sawtooth)
    src = np.zeros(n)
    for k in range(1, 12):
        src += np.sin(k * phase) / k
    src /= np.abs(src).max()

    # voicing / syllable envelope: raised-cosine syllable train with pauses
    syl_rate = rng.uniform(2.5, 4.5)
    env = 0.5 * (1 - np.cos(2 * np.pi * syl_rate * t))
    gate = (np.sin(2 * np.pi * rng.uniform(0.3, 0.7) * t
                   + rng.uniform(0, 2 * np.pi)) > -0.7).astype(float)
    env = env * gate

    # unvoiced bursts between syllables
    noise = rng.standard_normal(n) * 0.15
    burst_env = np.clip(np.sin(2 * np.pi * syl_rate * t + np.pi), 0, 1) ** 4
    excitation = src * env + noise * burst_env * gate

    # 3 time-varying formants: split into 50 ms blocks, each a 2-pole resonator
    block = int(0.05 * SR)
    out = np.zeros(n)
    n_blocks = (n + block - 1) // block
    centers = np.stack([
        np.exp(np.interp(np.linspace(0, 1, n_blocks),
                         np.linspace(0, 1, n_ctrl),
                         rng.uniform(np.log(lo), np.log(hi), n_ctrl)))
        for lo, hi in ((300, 900), (900, 2300), (2300, 3500))
    ])
    zi = [np.zeros(2) for _ in range(3)]
    for b in range(n_blocks):
        seg = excitation[b * block:(b + 1) * block]
        acc = np.zeros_like(seg)
        for fi in range(3):
            fc = centers[fi, b]
            bw = 80.0 + 0.06 * fc
            r = np.exp(-np.pi * bw / SR)
            theta = 2 * np.pi * fc / SR
            a = [1.0, -2 * r * np.cos(theta), r * r]
            y, zi[fi] = lfilter([1.0 - r], a, seg, zi=zi[fi])
            acc += y
        out[b * block:(b + 1) * block] = acc

    out = out / (np.abs(out).max() + 1e-9) * 0.6
    return out.astype(np.float32)


def derive_feats(wav: np.ndarray) -> np.ndarray:
    """(T, 13) features @ 200 Hz: 12 log-mel band energies + log-f0 proxy.
    Computed from the audio so the inverse mapping is learnable."""
    from articulatory_tpu.ops.stft import logmelfilterbank_np

    mel = logmelfilterbank_np(
        wav, SR, fft_size=512, hop_size=HOP, win_length=None,
        window="hann", num_mels=N_MELS, fmin=60, fmax=7800)

    # crude autocorrelation f0 proxy per frame (log domain, 0 when unvoiced)
    frame = 400
    n_frames = mel.shape[0]
    pad = np.pad(wav, (0, frame + n_frames * HOP - len(wav)), mode="constant")
    f0 = np.zeros(n_frames, np.float32)
    lo, hi = SR // 300, SR // 70
    for i in range(n_frames):
        seg = pad[i * HOP:i * HOP + frame]
        seg = seg - seg.mean()
        e0 = float(seg @ seg)
        if e0 < 1e-3:
            continue
        ac = np.correlate(seg, seg, "full")[frame - 1:]
        lag = lo + int(np.argmax(ac[lo:hi]))
        if ac[lag] > 0.3 * e0:
            f0[i] = np.log(SR / lag)
    return np.concatenate([mel, f0[:, None]], axis=1).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--n-utts", type=int, default=600)
    p.add_argument("--dev-utts", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--min-seconds", type=float, default=2.0)
    p.add_argument("--max-seconds", type=float, default=6.0)
    args = p.parse_args()

    from articulatory_tpu.utils.io import write_wav

    rng = np.random.default_rng(args.seed)
    root = args.root
    os.makedirs(f"{root}/wavs", exist_ok=True)
    os.makedirs(f"{root}/feats", exist_ok=True)
    for name in ("tr", "dev"):
        os.makedirs(f"{root}/data/{name}_set", exist_ok=True)

    entries = {"tr": [], "dev": []}
    for i in range(args.n_utts):
        utt = f"synth{i:04d}"
        seconds = rng.uniform(args.min_seconds, args.max_seconds)
        wav = synth_utterance(rng, seconds)
        write_wav(f"{root}/wavs/{utt}.wav", wav, SR)
        np.save(f"{root}/feats/{utt}.npy", derive_feats(wav))
        entries["dev" if i >= args.n_utts - args.dev_utts else "tr"].append(utt)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{args.n_utts}")

    for name, utts in entries.items():
        with open(f"{root}/data/{name}_set/wav.scp", "w") as f:
            for utt in utts:
                f.write(f"{utt} {root}/wavs/{utt}.wav\n")
        with open(f"{root}/data/{name}_set/feats.scp", "w") as f:
            for utt in utts:
                f.write(f"{utt} {root}/feats/{utt}.npy\n")
    print(f"wrote {len(entries['tr'])} train / {len(entries['dev'])} dev to {root}")


if __name__ == "__main__":
    main()
