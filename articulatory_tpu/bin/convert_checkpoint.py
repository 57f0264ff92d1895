#!/usr/bin/env python3
"""Convert a reference (PyTorch) checkpoint to this framework's format.

PyTorch-free inference ingestion: the generator weights from a reference
``checkpoint-XXXsteps.pkl`` / ``best_mel_ckpt.pkl`` are mapped to our param
layout (utils/torch_import.py) and written as a msgpack checkpoint that
``load_model`` / ``--pretrain`` accept.

Usage:
    python -m articulatory_tpu.bin.convert_checkpoint \
        --checkpoint ref/best_mel_ckpt.pkl --config ref/config.yml \
        --out exp/converted/best_mel_ckpt.pkl
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml

import flax.serialization


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()

    if args.config is None:
        args.config = os.path.join(os.path.dirname(args.checkpoint), "config.yml")
    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)

    from articulatory_tpu.config import fix_generator_params
    from articulatory_tpu.utils.torch_import import (
        GENERATOR_IMPORTERS,
        load_torch_checkpoint,
    )

    ckpt = load_torch_checkpoint(args.checkpoint)
    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    gen_params = fix_generator_params(config["generator_params"])
    if gen_type not in GENERATOR_IMPORTERS:
        raise NotImplementedError(f"no importer for generator {gen_type}")
    params_g, mutables_g = GENERATOR_IMPORTERS[gen_type](
        ckpt["model"]["generator"], gen_params)

    payload = {
        "model": {"generator": params_g},
        "optimizer": {},
        "mutables": {"generator": mutables_g.get("batch_stats", {})
                     if mutables_g else {}},
        "scheduler": {},
        "steps": int(ckpt.get("steps", 0)),
        "epochs": int(ckpt.get("epochs", 0)),
    }
    from articulatory_tpu.utils.torch_import import DISCRIMINATOR_IMPORTERS

    disc_type = config.get("discriminator_type")
    if "discriminator" in ckpt.get("model", {}) and \
            disc_type in DISCRIMINATOR_IMPORTERS:
        try:
            payload["model"]["discriminator"] = DISCRIMINATOR_IMPORTERS[
                disc_type](ckpt["model"]["discriminator"],
                           config.get("discriminator_params", {}))
        except KeyError as e:
            logging.warning(
                f"discriminator NOT converted (layout mismatch on key {e}); "
                f"the output checkpoint has no discriminator — training "
                f"resumed from it will re-init the discriminator randomly")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    n = sum(int(np.prod(v.shape)) for v in _leaves(params_g))
    print(f"converted generator ({n:,} params) -> {args.out}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
