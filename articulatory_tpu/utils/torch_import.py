"""Convert reference (PyTorch) checkpoints into articulatory_tpu param pytrees.

The reference stores pickled state dicts with ``torch.nn.utils.weight_norm``
parameters (``weight_g``/``weight_v``; reference train.py:140-239). This
module maps those onto our flax param trees, handling the layout changes:

- Conv1d   torch (C_out, C_in, K)      -> ours (K, C_in, C_out)
- ConvT1d  torch (C_in, C_out, K)      -> ours (K, C_in, C_out), time-flipped
- Conv2d   torch (C_out, C_in, Kh, Kw) -> ours (Kh, Kw, C_in, C_out)
- Linear   torch (out, in)             -> ours (in, out)

Only numpy is required at conversion time if the checkpoint has already been
unpickled to numpy arrays; ``load_torch_checkpoint`` uses torch (CPU) when
available.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pkl checkpoint into nested numpy dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(obj):
        if isinstance(obj, torch.Tensor):
            return obj.detach().numpy()
        if isinstance(obj, dict):
            return {k: to_np(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(to_np(v) for v in obj)
        return obj

    return to_np(ckpt)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().numpy()
    return np.asarray(x)


class _SD:
    """Typed accessor over a flat torch state dict."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = {k: _np(v) for k, v in sd.items()}

    def has(self, name: str) -> bool:
        return name in self.sd

    def conv1d(self, prefix: str) -> dict:
        """Conv1d with or without weight norm -> our param dict."""
        out: dict[str, np.ndarray] = {}
        if f"{prefix}.weight_v" in self.sd:
            v = self.sd[f"{prefix}.weight_v"]  # (C_out, C_in, K)
            g = self.sd[f"{prefix}.weight_g"]  # (C_out, 1, 1)
            out["v"] = np.transpose(v, (2, 1, 0))
            out["g"] = np.transpose(g, (2, 1, 0))
        else:
            w = self.sd[f"{prefix}.weight"]
            out["w"] = np.transpose(w, (2, 1, 0))
        if f"{prefix}.bias" in self.sd:
            out["b"] = self.sd[f"{prefix}.bias"]
        return out

    def conv_transpose1d(self, prefix: str) -> dict:
        out: dict[str, np.ndarray] = {}
        if f"{prefix}.weight_v" in self.sd:
            v = self.sd[f"{prefix}.weight_v"]  # (C_in, C_out, K)
            g = self.sd[f"{prefix}.weight_g"]  # (C_in, 1, 1)
            out["v"] = np.transpose(v[:, :, ::-1], (2, 0, 1)).copy()
            out["g"] = np.transpose(g, (2, 0, 1))
        else:
            w = self.sd[f"{prefix}.weight"]
            out["w"] = np.transpose(w[:, :, ::-1], (2, 0, 1)).copy()
        if f"{prefix}.bias" in self.sd:
            out["b"] = self.sd[f"{prefix}.bias"]
        return out

    def conv2d(self, prefix: str) -> dict:
        out: dict[str, np.ndarray] = {}
        if f"{prefix}.weight_v" in self.sd:
            v = self.sd[f"{prefix}.weight_v"]  # (C_out, C_in, Kh, Kw)
            g = self.sd[f"{prefix}.weight_g"]  # (C_out, 1, 1, 1)
            out["v"] = np.transpose(v, (2, 3, 1, 0))
            out["g"] = np.transpose(g, (2, 3, 1, 0))
        else:
            w = self.sd[f"{prefix}.weight"]
            out["w"] = np.transpose(w, (2, 3, 1, 0))
        if f"{prefix}.bias" in self.sd:
            out["b"] = self.sd[f"{prefix}.bias"]
        return out

    def linear(self, prefix: str) -> dict:
        out = {"w": np.transpose(self.sd[f"{prefix}.weight"], (1, 0))}
        if f"{prefix}.bias" in self.sd:
            out["b"] = self.sd[f"{prefix}.bias"]
        return out

    def embedding(self, prefix: str) -> dict:
        return {"w": self.sd[f"{prefix}.weight"]}


def import_hifigan_generator(state_dict: Mapping[str, Any], config: Mapping[str, Any]
                             ) -> dict:
    """Map a reference HiFiGANGenerator state dict to our param tree.

    ``config`` is the ``generator_params`` dict from the experiment yaml.
    """
    sd = _SD(state_dict)
    num_ups = len(config.get("upsample_scales", (8, 8, 2, 2)))
    rks = config.get("resblock_kernel_sizes", (3, 7, 11))
    rdils = config.get("resblock_dilations", ((1, 3, 5),) * 3)
    use_additional = config.get("use_additional_convs", True)
    params: dict[str, Any] = {}

    params["input_conv"] = sd.conv1d("input_conv")
    for i in range(num_ups):
        params[f"upsample_{i}"] = sd.conv_transpose1d(f"upsamples.{i}.1")
        for j in range(len(rks)):
            idx = i * len(rks) + j
            block: dict[str, Any] = {}
            for d in range(len(rdils[j])):
                block[f"convs1_{d}"] = sd.conv1d(f"blocks.{idx}.convs1.{d}.1")
                if use_additional:
                    block[f"convs2_{d}"] = sd.conv1d(f"blocks.{idx}.convs2.{d}.1")
            params[f"block_{i}_{j}"] = block
    params["output_conv"] = sd.conv1d("output_conv.1")

    if config.get("use_ar", False):
        ar = {}
        for li, ti in enumerate([0, 2, 4, 6, 8]):
            ar[f"fc{li}"] = sd.linear(f"ar_model.model.{ti}")
        params["ar_model"] = ar
    if config.get("use_spk_id", False):
        params["spk_emb_mat"] = sd.embedding("spk_emb_mat")
        params["spk_fc"] = sd.linear("spk_fc")
    if config.get("use_ph", False):
        params["ph_emb_mat"] = sd.embedding("ph_emb_mat")
    if config.get("use_ph_loss", False):
        params["ph_fc"] = sd.linear("ph_fc")
    return params


def import_hifigan_msmpd(state_dict: Mapping[str, Any], config: Mapping[str, Any]
                         ) -> dict:
    """Map a reference HiFiGANMultiScaleMultiPeriodDiscriminator state dict."""
    sd = _SD(state_dict)
    scales = config.get("scales", 3)
    periods = config.get("periods", (2, 3, 5, 7, 11))
    scale_params = config.get("scale_discriminator_params", {})
    period_params = config.get("period_discriminator_params", {})
    n_scale_layers = len(scale_params.get("downsample_scales", (2, 2, 4, 4, 1))) + 3
    n_period_convs = len(period_params.get("downsample_scales", (3, 3, 3, 3, 1)))

    msd: dict[str, Any] = {}
    for i in range(scales):
        disc: dict[str, Any] = {}
        for k in range(n_scale_layers):
            prefix = f"msd.discriminators.{i}.layers.{k}"
            # all but the last layer are Sequential(conv, act)
            sub = f"{prefix}.0" if sd.has(f"{prefix}.0.weight") else prefix
            disc[f"layer_{k}"] = sd.conv1d(sub)
        msd[f"disc_{i}"] = disc

    mpd: dict[str, Any] = {}
    for i in range(len(periods)):
        disc = {}
        for k in range(n_period_convs):
            disc[f"conv_{k}"] = sd.conv2d(f"mpd.discriminators.{i}.convs.{k}.0")
        disc["output_conv"] = sd.conv2d(f"mpd.discriminators.{i}.output_conv")
        mpd[f"disc_{i}"] = disc

    return {"msd": msd, "mpd": mpd}
