"""YAML config handling (reference pattern: load, merge CLI args, re-dump).

The dumped ``config.yml`` beside checkpoints is the inference-time contract
(reference train.py:1500-1506, decode.py:182-187); schema is preserved.
"""

from __future__ import annotations

import os

import yaml


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.load(f, Loader=yaml.Loader)


def merge_args(config: dict, args) -> dict:
    """config.update(vars(args)) parity (train.py:1503)."""
    config = dict(config)
    config.update(vars(args))
    return config


def dump_config(config: dict, outdir: str, name: str = "config.yml") -> str:
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, name)
    with open(path, "w") as f:
        yaml.dump(config, f, Dumper=yaml.Dumper)
    return path


def fix_generator_params(params: dict) -> dict:
    """Back-compat: fix the 'upsample_kernal_sizes' typo (reference
    utils/utils.py:330-334)."""
    return {k.replace("upsample_kernal_sizes", "upsample_kernel_sizes"): v
            for k, v in params.items()}
