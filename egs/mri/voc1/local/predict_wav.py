#!/usr/bin/env python3
"""Predict waveforms from articulatory features (public EMA->wav API).

Parity target: reference egs/ema/voc1/local/predict_wav.py — reads a
feats.scp of .npy features, loads the trained generator, runs the chunked
AR loop (or full-utterance inference), writes <fid>.wav; skips utterances
with <= 250 frames (reference :128-137).

Usage:
    python local/predict_wav.py --feats-scp feats.scp --checkpoint ckpt \
        --outdir out [--config config.yml]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from tqdm import tqdm

from articulatory_tpu.inference import ar_loop, load_model
from articulatory_tpu.utils.io import load_scp, write_wav
from articulatory_tpu.utils.platform import honor_jax_platforms


def main():
    # re-apply JAX_PLATFORMS after any sitecustomize jax import
    honor_jax_platforms()
    parser = argparse.ArgumentParser(description="Predict wav from features.")
    parser.add_argument("--feats-scp", "--scp", type=str, required=True)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARN)

    if args.config is None:
        args.config = os.path.join(os.path.dirname(args.checkpoint), "config.yml")
    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)
    config.update(vars(args))

    os.makedirs(args.outdir, exist_ok=True)
    scp = load_scp(args.feats_scp)
    model = load_model(args.checkpoint, config)
    logging.info(f"Loaded model parameters from {args.checkpoint}.")
    n_params = sum(int(np.prod(p.shape))
                   for p in __import__("jax").tree.leaves(model.params))
    print(n_params)

    for fid, featp in tqdm(scp.items()):
        c = np.load(featp)
        if c.shape[0] > 250:
            if config["generator_params"].get("use_ar", False):
                y = ar_loop(model, c, config)
            else:
                y = model.inference(c).squeeze()
            write_wav(os.path.join(args.outdir, fid + ".wav"), np.asarray(y),
                      config["sampling_rate"])


if __name__ == "__main__":
    main()
