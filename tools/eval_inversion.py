#!/usr/bin/env python3
"""Inversion quality metrics: RMSE + Pearson correlation per channel.

Compares decoded articulatory trajectories (``<utt>_gen.npy`` from
``bin/decode`` in an inversion mode, e.g. m2a/w2a) against ground-truth
feature files from a feats.scp. The articulatory-inversion literature (the
papers behind the reference repo, README.md:77-107) reports exactly these
two numbers; the reference itself ships no metric CLI.

Usage:
  python tools/eval_inversion.py --gen-dir out/ --feats-scp data/dev/feats.scp
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen-dir", required=True)
    p.add_argument("--feats-scp", required=True)
    args = p.parse_args()

    refs = {}
    with open(args.feats_scp) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            utt, path = line.split(maxsplit=1)
            refs[utt] = path

    rmses, corrs, n_utts = [], [], 0
    for gen_path in sorted(glob.glob(os.path.join(args.gen_dir, "*_gen.npy"))):
        utt = os.path.basename(gen_path)[: -len("_gen.npy")]
        if utt not in refs:
            continue
        gen = np.load(gen_path)
        ref = np.load(refs[utt]).astype(np.float64)
        t = min(len(gen), len(ref))
        gen, ref = gen[:t].astype(np.float64), ref[:t]
        rmses.append(np.sqrt(np.mean((gen - ref) ** 2, axis=0)))
        cs = []
        for c in range(ref.shape[1]):
            g, r = gen[:, c], ref[:, c]
            if g.std() < 1e-8 or r.std() < 1e-8:
                cs.append(0.0)
            else:
                cs.append(float(np.corrcoef(g, r)[0, 1]))
        corrs.append(cs)
        n_utts += 1

    if not n_utts:
        raise SystemExit("no matching <utt>_gen.npy files found")
    rmse = np.mean(np.stack(rmses), axis=0)
    corr = np.mean(np.asarray(corrs), axis=0)
    print(f"utterances: {n_utts}")
    print("per-channel RMSE:", " ".join(f"{v:.3f}" for v in rmse))
    print("per-channel Pearson r:", " ".join(f"{v:.3f}" for v in corr))
    print(f"mean RMSE: {rmse.mean():.4f}")
    print(f"mean Pearson r: {corr.mean():.4f}")


if __name__ == "__main__":
    main()
