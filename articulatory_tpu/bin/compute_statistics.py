#!/usr/bin/env python3
"""Compute mean/scale statistics of dumped features.

Parity target: reference articulatory/bin/compute_statistics.py (StandardScaler
partial_fit over train features -> stats.h5 'mean'/'scale' or stacked npy).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from sklearn.preprocessing import StandardScaler
from tqdm import tqdm

from articulatory_tpu.bin.preprocess import set_logging
from articulatory_tpu.data.datasets import MelDataset, MelSCPDataset
from articulatory_tpu.utils.io import read_hdf5, write_hdf5


def main():
    parser = argparse.ArgumentParser(
        description="Compute mean and variance of dumped raw features.")
    parser.add_argument("--feats-scp", "--scp", default=None, type=str)
    parser.add_argument("--rootdir", type=str, default=None)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--dumpdir", default=None, type=str, required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    set_logging(args.verbose)

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)
    config.update(vars(args))

    if (args.feats_scp is not None) == (args.rootdir is not None):
        raise ValueError("Please specify either --rootdir or --feats-scp.")

    if args.feats_scp is None:
        if config["format"] == "hdf5":
            mel_query = "*.h5"
            mel_load_fn = lambda x: read_hdf5(x, "feats")  # noqa: E731
        elif config["format"] == "npy":
            mel_query = "*-feats.npy"
            mel_load_fn = np.load
        else:
            raise ValueError("support only hdf5 or npy format.")
        dataset = MelDataset(args.rootdir, mel_query=mel_query,
                             mel_load_fn=mel_load_fn)
    else:
        dataset = MelSCPDataset(args.feats_scp)
    logging.info(f"The number of files = {len(dataset)}.")

    scaler = StandardScaler()
    for mel in tqdm(dataset):
        scaler.partial_fit(mel)

    os.makedirs(args.dumpdir, exist_ok=True)
    if config["format"] == "hdf5":
        write_hdf5(os.path.join(args.dumpdir, "stats.h5"), "mean",
                   scaler.mean_.astype(np.float32))
        write_hdf5(os.path.join(args.dumpdir, "stats.h5"), "scale",
                   scaler.scale_.astype(np.float32))
    else:
        stats = np.stack([scaler.mean_, scaler.scale_], axis=0)
        np.save(os.path.join(args.dumpdir, "stats.npy"),
                stats.astype(np.float32), allow_pickle=False)


if __name__ == "__main__":
    main()
