"""Write a 1-ulp-perturbed copy of a checkpoint's generator params.

The noise-cone control arm used by every quality A/B
(tools/bf16_quality_ab.sh, tools/mri_hybrid_quality_ab.sh,
tools/hybrid_train_quality_ab.sh): chunked-AR decode and GAN training are
both chaotic, so "how far does the f32 path drift from itself under a
minimal (1-ulp) parameter perturbation" is the yardstick any precision
variant's divergence must be judged against (docs/DESIGN.md §7-8).

Usage: python tools/perturb_ckpt.py <in.ckpt> <out.ckpt> [--scale ULP]
"""

import argparse

import flax
import jax
import numpy as np

from articulatory_tpu.utils.checkpoint import load_checkpoint


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--scale", type=float, default=float(np.float32(2.0 ** -23)),
                   help="relative perturbation (default: 1 f32 ulp)")
    args = p.parse_args()

    ckpt = load_checkpoint(args.src)
    factor = np.float32(1.0 + args.scale)
    ckpt["model"]["generator"] = jax.tree.map(
        lambda a: (a * factor).astype(a.dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        ckpt["model"]["generator"])
    with open(args.dst, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(ckpt))
    print(f"wrote 1-ulp perturbed {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
