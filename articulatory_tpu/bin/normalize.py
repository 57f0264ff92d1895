#!/usr/bin/env python3
"""Normalize dumped features using precomputed statistics.

Parity target: reference articulatory/bin/normalize.py (z-score features with
stats mean/scale, copy the wave stream through untouched).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from tqdm import tqdm

from articulatory_tpu.bin.preprocess import set_logging
from articulatory_tpu.data.datasets import SpeechDataset
from articulatory_tpu.utils.io import find_files, read_hdf5, write_hdf5


def main():
    parser = argparse.ArgumentParser(
        description="Normalize dumped raw features.")
    parser.add_argument("--rootdir", type=str, default=None)
    parser.add_argument("--wav-scp", "--scp", default=None, type=str)
    parser.add_argument("--feats-scp", default=None, type=str)
    parser.add_argument("--segments", default=None, type=str)
    parser.add_argument("--dumpdir", type=str, required=True)
    parser.add_argument("--stats", type=str, required=True)
    parser.add_argument("--skip-wav-copy", default=False, action="store_true")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    set_logging(args.verbose)

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)
    config.update(vars(args))

    # load statistics
    if args.stats.endswith(".h5"):
        mean = read_hdf5(args.stats, "mean")
        scale = read_hdf5(args.stats, "scale")
    else:
        arr = np.load(args.stats)
        mean, scale = arr[0], arr[1]

    os.makedirs(args.dumpdir, exist_ok=True)

    if (args.feats_scp is not None) == (args.rootdir is not None):
        raise ValueError("Please specify either --rootdir or --feats-scp.")

    if args.feats_scp is not None:
        # scp-driven path (reference normalize.py:149-161): features from
        # feats.scp, audio (unless --skip-wav-copy) paired from wav.scp
        from articulatory_tpu.data.datasets import MelSCPDataset
        from articulatory_tpu.utils.io import WavScpLoader

        dataset = MelSCPDataset(args.feats_scp, return_utt_id=True)
        wav_loader = None
        if not args.skip_wav_copy:
            if args.wav_scp is None:
                raise ValueError("--wav-scp required unless --skip-wav-copy")
            wav_loader = WavScpLoader(args.wav_scp, segments=args.segments)
        for utt_id, mel in tqdm(dataset):
            mel = ((mel - mean) / scale).astype(np.float32)
            if config["format"] == "hdf5":
                out = os.path.join(args.dumpdir, f"{utt_id}.h5")
                write_hdf5(out, "feats", mel)
                if wav_loader is not None:
                    audio, _ = wav_loader[utt_id]
                    write_hdf5(out, "wave", audio.astype(np.float32))
            elif config["format"] == "npy":
                np.save(os.path.join(args.dumpdir, f"{utt_id}-feats.npy"),
                        mel, allow_pickle=False)
                if wav_loader is not None:
                    audio, _ = wav_loader[utt_id]
                    np.save(os.path.join(args.dumpdir, f"{utt_id}-wave.npy"),
                            audio.astype(np.float32), allow_pickle=False)
            else:
                raise ValueError("support only hdf5 or npy format.")
        return

    if config["format"] == "hdf5":
        files = sorted(find_files(args.rootdir, "*.h5"))
        for path in tqdm(files):
            utt_id = os.path.splitext(os.path.basename(path))[0]
            mel = read_hdf5(path, "feats")
            mel = (mel - mean) / scale
            out = os.path.join(args.dumpdir, f"{utt_id}.h5")
            write_hdf5(out, "feats", mel.astype(np.float32))
            if not args.skip_wav_copy:
                audio = read_hdf5(path, "wave")
                write_hdf5(out, "wave", audio.astype(np.float32))
    elif config["format"] == "npy":
        files = sorted(find_files(args.rootdir, "*-feats.npy"))
        for path in tqdm(files):
            utt_id = os.path.basename(path).replace("-feats.npy", "")
            mel = np.load(path)
            mel = (mel - mean) / scale
            np.save(os.path.join(args.dumpdir, f"{utt_id}-feats.npy"),
                    mel.astype(np.float32), allow_pickle=False)
            if not args.skip_wav_copy:
                audio = np.load(path.replace("-feats.npy", "-wave.npy"))
                np.save(os.path.join(args.dumpdir, f"{utt_id}-wave.npy"),
                        audio.astype(np.float32), allow_pickle=False)
    else:
        raise ValueError("support only hdf5 or npy format.")


if __name__ == "__main__":
    main()
