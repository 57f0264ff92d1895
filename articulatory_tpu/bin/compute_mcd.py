#!/usr/bin/env python3
"""Compute average MCD between two directories of wav files.

Pairs files by shared basename (ignoring the '_gen' suffix that decode
appends). Usage:
    python -m articulatory_tpu.bin.compute_mcd --gen-dir out --ref-dir ref \
        [--dtw]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from articulatory_tpu.eval.mcd import mel_cepstral_distortion
from articulatory_tpu.utils.io import read_wav


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gen-dir", type=str, required=True)
    parser.add_argument("--ref-dir", type=str, required=True)
    parser.add_argument("--dtw", action="store_true")
    args = parser.parse_args()

    def key(name):
        base = os.path.splitext(name)[0]
        return base[:-4] if base.endswith("_gen") else base

    gen = {key(f): os.path.join(args.gen_dir, f)
           for f in os.listdir(args.gen_dir) if f.endswith(".wav")}
    ref = {key(f): os.path.join(args.ref_dir, f)
           for f in os.listdir(args.ref_dir) if f.endswith(".wav")}
    common = sorted(set(gen) & set(ref))
    assert common, "no overlapping utterances between the two directories"

    mcds = []
    for k in common:
        a, sr_a = read_wav(gen[k])
        b, sr_b = read_wav(ref[k])
        assert sr_a == sr_b, f"{k}: sample-rate mismatch"
        mcds.append(mel_cepstral_distortion(a, b, sr_a, use_dtw=args.dtw))
        print(f"{k}\t{mcds[-1]:.3f}")
    print(f"mean MCD over {len(mcds)} utterances: {np.mean(mcds):.3f} dB")


if __name__ == "__main__":
    main()
