#!/usr/bin/env python3
"""Make the MNGU0 train/val/test split and EMA feature files.

Parity target: reference egs/ema/voc1/local/mk_ema_feats.py — parse MNGU0
text-format ``.ema`` files into .npy arrays (dropping utterances containing
NaNs), split train/val/test from ``txt.done.data.{train,test}`` (60 random
validation utterances, seed 0), and write feats.scp / wav.scp / utt2spk /
spk2utt for each set.
"""

from __future__ import annotations

import os
import random

import numpy as np
from tqdm import tqdm

PARENTD = "downloads/emadata"
RAWD = os.path.join(PARENTD, "cin_us_mngu0")
SPK = "mngu0_s1"
NUM_VAL = 60


def read_split():
    etcd = os.path.join(RAWD, "etc")
    with open(os.path.join(etcd, "txt.done.data.train")) as f:
        lines = f.readlines()
    random.Random(0).shuffle(lines)
    train_lines, val_lines = lines[:-NUM_VAL], lines[-NUM_VAL:]
    with open(os.path.join(etcd, "txt.done.data.test")) as f:
        test_lines = f.readlines()
    to_fids = lambda ls: sorted(l.strip().split()[1] for l in ls)  # noqa: E731
    return {"mngu0_train": to_fids(train_lines),
            "mngu0_val": to_fids(val_lines),
            "mngu0_test": to_fids(test_lines)}


def convert_ema(fid: str, emad: str, outd: str) -> str | None:
    """Parse one text .ema file -> .npy; return the path or None if NaN."""
    with open(os.path.join(emad, fid + ".ema")) as f:
        rows = [[float(v) for v in line.split()] for line in f if line.strip()]
    arr = np.asarray(rows)
    if np.any(np.isnan(arr)):
        return None
    path = os.path.join(outd, fid + ".npy")
    np.save(path, arr)
    return path


def main():
    emad = os.path.join(RAWD, "nema")
    wavd = os.path.join(RAWD, "wav")
    actionsd = os.path.join(RAWD, "actions")
    os.makedirs(actionsd, exist_ok=True)

    splits = read_split()
    dropped = 0
    for setname, fids in splits.items():
        datadir = os.path.join("data", setname)
        os.makedirs(datadir, exist_ok=True)
        kept = []
        with open(os.path.join(datadir, "feats.scp"), "w") as feats_f:
            for fid in tqdm(fids, desc=setname):
                path = convert_ema(fid, emad, actionsd)
                if path is None:
                    dropped += 1
                    continue
                feats_f.write(f"{fid} {path}\n")
                kept.append(fid)
        with open(os.path.join(datadir, "wav.scp"), "w") as f:
            for fid in kept:
                f.write(f"{fid} {os.path.join(wavd, fid + '.wav')}\n")
        with open(os.path.join(datadir, "utt2spk"), "w") as f:
            for fid in kept:
                f.write(f"{fid} {SPK}\n")
        with open(os.path.join(datadir, "spk2utt"), "w") as f:
            f.write(f"{SPK} {' '.join(kept)}\n")
        print(setname, len(kept))
    if dropped:
        print(f"dropped {dropped} utterances containing NaNs")


if __name__ == "__main__":
    main()
