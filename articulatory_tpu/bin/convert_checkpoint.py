#!/usr/bin/env python3
"""Convert checkpoints between the reference (PyTorch) and this framework.

torch -> jax (default): the generator weights from a reference
``checkpoint-XXXsteps.pkl`` / ``best_mel_ckpt.pkl`` are mapped to our param
layout (utils/torch_import.py) and written as a msgpack checkpoint that
``load_model`` / ``--pretrain`` accept.

jax -> torch (``--to-torch``): one of OUR msgpack/orbax checkpoints is
exported as a reference-format torch pickle (weight_g/weight_v reparam
included; utils/torch_export.py) that the REFERENCE's ``load_model``
(reference utils/utils.py:294-372) and ``--pretrain`` consume — our
training runs stay usable by every existing reference workflow.

Usage:
    python -m articulatory_tpu.bin.convert_checkpoint \
        --checkpoint ref/best_mel_ckpt.pkl --config ref/config.yml \
        --out exp/converted/best_mel_ckpt.pkl
    python -m articulatory_tpu.bin.convert_checkpoint --to-torch \
        --checkpoint exp/ours/best_mel_ckpt.pkl --out export/ckpt.pkl
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
    parser.add_argument("--to-torch", action="store_true",
                        help="export one of OUR checkpoints as a "
                             "reference-format torch pickle")
    args = parser.parse_args()

    if args.config is None:
        args.config = os.path.join(os.path.dirname(args.checkpoint), "config.yml")
    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)

    if args.to_torch:
        import torch

        from articulatory_tpu.utils.checkpoint import load_checkpoint
        from articulatory_tpu.utils.torch_export import export_checkpoint

        payload = load_checkpoint(args.checkpoint)
        out = export_checkpoint(payload, config)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        torch.save(out, args.out)
        n = sum(int(v.numel()) for v in out["model"]["generator"].values())
        print(f"exported generator ({n:,} params) as torch pickle -> "
              f"{args.out}")
        return

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
