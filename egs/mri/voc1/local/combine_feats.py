#!/usr/bin/env python3
"""Concatenate feature directories channel-wise into a combined feature set.

Parity target: reference egs/ema/voc1/local/combine_feats.py — intersect the
utterance sets of all feature dirs, minmax-normalize any dir that has a
``<name>_minmax.txt`` (e.g. pitch), truncate to the shortest stream, and
write ``<outdir>/<fid>.npy`` with the channels concatenated.

Usage: python3 local/combine_feats.py downloads/emadata/cin_us_mngu0 \
    --feats pitch actions -o fnema
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from tqdm import tqdm


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("d")
    parser.add_argument("--feats", nargs="+", required=True)
    parser.add_argument("-o", required=True)
    args = parser.parse_args()

    oud = os.path.join(args.d, args.o)
    os.makedirs(oud, exist_ok=True)

    fid_sets = []
    for feat in args.feats:
        d = os.path.join(args.d, feat)
        fid_sets.append({f for f in os.listdir(d) if f.endswith(".npy")})
    common = sorted(set.intersection(*fid_sets))
    print(len(common))

    minmax = {}
    for feat in args.feats:
        p = os.path.join(args.d, f"{feat}_minmax.txt")
        if os.path.exists(p):
            with open(p) as f:
                lo, hi = (float(v) for v in f.readline().split())
            minmax[feat] = (lo, hi - lo)

    for f in tqdm(common):
        streams = []
        for feat in args.feats:
            arr = np.load(os.path.join(args.d, feat, f))
            if arr.ndim == 1:
                arr = arr[:, None]
            if feat in minmax:
                lo, rng = minmax[feat]
                arr = (arr - lo) / rng
            streams.append(arr)
        min_len = min(len(a) for a in streams)
        np.save(os.path.join(oud, f),
                np.concatenate([a[:min_len] for a in streams], axis=1))


if __name__ == "__main__":
    main()
