"""Checkpoint save/restore with the reference's logical layout.

Layout mirrors bin/train.py:140-239: {model: {generator, discriminator
[, generator2]}, optimizer: {...}, scheduler: {...}, steps, epochs}, stored
as flax msgpack instead of a torch pickle. ``load_reference_checkpoint``
ingests the reference's torch pickles for weight import / parity eval.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization
import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, schedulers: dict | None = None,
                    epochs: int = 0) -> None:
    """Serialize a GANTrainState (+ host scheduler states) to one file."""
    payload = {
        "model": {
            "generator": _to_host(state.params_g),
            "discriminator": _to_host(state.params_d),
        },
        "optimizer": {
            "generator": flax.serialization.to_state_dict(_to_host(state.opt_g)),
            "discriminator": flax.serialization.to_state_dict(_to_host(state.opt_d)),
        },
        "mutables": {
            "generator": _to_host(state.mutables_g),
        },
        "scheduler": {k: v.state_dict() for k, v in (schedulers or {}).items()},
        "steps": int(state.steps),
        "epochs": int(epochs),
    }
    if state.params_g2 is not None:
        payload["model"]["generator2"] = _to_host(state.params_g2)
    folder = os.path.dirname(path)
    if folder:
        os.makedirs(folder, exist_ok=True)
    blob = flax.serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    if os.path.isdir(path):
        return load_checkpoint_orbax(path)
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


# ---------------------------------------------------------------------------
# orbax backend (multi-host/sharded-array checkpointing for large fleets;
# saves each host's shards without gathering to host 0)
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, state, schedulers: dict | None = None,
                          epochs: int = 0) -> None:
    """Save a GANTrainState as an orbax directory checkpoint."""
    import orbax.checkpoint as ocp

    payload = {
        "model": {
            "generator": state.params_g,
            "discriminator": state.params_d,
        },
        "optimizer": {
            "generator": flax.serialization.to_state_dict(state.opt_g),
            "discriminator": flax.serialization.to_state_dict(state.opt_d),
        },
        "mutables": {"generator": state.mutables_g},
        "meta": {
            "steps": int(state.steps),
            "epochs": int(epochs),
            "scheduler": {k: v.state_dict()
                          for k, v in (schedulers or {}).items()},
        },
    }
    if state.params_g2 is not None:
        payload["model"]["generator2"] = state.params_g2
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load_checkpoint_orbax(path: str) -> dict:
    """Load an orbax directory checkpoint into the msgpack payload layout."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(os.path.abspath(path))
    meta = payload.pop("meta", {})
    payload["steps"] = int(meta.get("steps", 0))
    payload["epochs"] = int(meta.get("epochs", 0))
    payload["scheduler"] = meta.get("scheduler", {})
    return payload


def restore_state(state, payload: dict, schedulers: dict | None = None,
                  load_only_params: bool = False):
    """Rebuild a GANTrainState from a checkpoint payload.

    ``load_only_params`` mirrors --pretrain (params only, keep fresh
    optimizer/step); otherwise mirrors --resume (full state).
    """
    import jax.numpy as jnp

    def merge(target, source):
        return flax.serialization.from_state_dict(target, source)

    new = state.replace(
        params_g=merge(state.params_g, payload["model"]["generator"]),
        params_d=merge(state.params_d, payload["model"]["discriminator"]),
    )
    if "generator2" in payload.get("model", {}) and state.params_g2 is not None:
        new = new.replace(params_g2=merge(state.params_g2,
                                          payload["model"]["generator2"]))
    if payload.get("mutables", {}).get("generator") and state.mutables_g:
        new = new.replace(mutables_g=merge(state.mutables_g,
                                           payload["mutables"]["generator"]))
    if load_only_params:
        return new, 0
    new = new.replace(
        opt_g=merge(state.opt_g, payload["optimizer"]["generator"]),
        opt_d=merge(state.opt_d, payload["optimizer"]["discriminator"]),
        steps=jnp.asarray(payload.get("steps", 0), jnp.int32),
    )
    if schedulers:
        for k, v in payload.get("scheduler", {}).items():
            if k in schedulers and v:
                schedulers[k].load_state_dict(
                    {kk: (vv.item() if hasattr(vv, "item") else vv)
                     for kk, vv in v.items()})
    return new, int(payload.get("epochs", 0))
