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


def import_melgan_generator(state_dict: Mapping[str, Any], config: Mapping[str, Any]
                            ) -> dict:
    """Map a reference MelGANGenerator state dict (non-causal variant)."""
    sd = _SD(state_dict)
    scales = config.get("upsample_scales", (8, 8, 2, 2))
    stacks = config.get("stacks", 3)
    assert not config.get("use_causal_conv", False), \
        "causal MelGAN import not implemented"
    params: dict[str, Any] = {}
    params["first_conv"] = sd.conv1d("melgan.1")
    idx = 2
    for i in range(len(scales)):
        idx += 1  # activation
        params[f"upsample_{i}"] = sd.conv_transpose1d(f"melgan.{idx}")
        idx += 1
        for j in range(stacks):
            stack = {
                "conv_dilated": sd.conv1d(f"melgan.{idx}.stack.2"),
                "conv_out": sd.conv1d(f"melgan.{idx}.stack.4"),
                "conv_skip": sd.conv1d(f"melgan.{idx}.skip_layer"),
            }
            params[f"stack_{i}_{j}"] = stack
            idx += 1
    idx += 2  # final activation + pad layer
    params["last_conv"] = sd.conv1d(f"melgan.{idx}")
    return params


def _fold_conv2d_wn(sd: _SD, prefix: str) -> np.ndarray:
    """Effective (folded) Conv2d weight in our (Kh, Kw, C_in, C_out) layout."""
    v = sd.sd[f"{prefix}.weight_v"]  # (C_out, C_in, Kh, Kw)
    g = sd.sd[f"{prefix}.weight_g"]  # (C_out, 1, 1, 1)
    norm = np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True))
    w = g * v / norm
    return np.transpose(w, (2, 3, 1, 0))


def import_pwg_generator(state_dict: Mapping[str, Any], config: Mapping[str, Any]
                         ) -> dict:
    """Map a reference ParallelWaveGANGenerator state dict."""
    sd = _SD(state_dict)
    layers = config.get("layers", 30)
    up_params = config.get("upsample_params", {"upsample_scales": [4, 4, 4, 4]})
    scales = up_params.get("upsample_scales", [4, 4, 4, 4])
    has_act = up_params.get("nonlinear_activation") is not None
    params: dict[str, Any] = {"first_conv": sd.conv1d("first_conv")}

    if config.get("upsample_conditional_features", True):
        up: dict[str, Any] = {}
        stride = 3 if has_act else 2
        for i in range(len(scales)):
            # up_layers: [stretch, conv2d(, act)] per scale; conv at 1 + i*stride
            t_idx = 1 + i * stride
            up[f"conv_{i}_w"] = _fold_conv2d_wn(
                sd, f"upsample_net.upsample.up_layers.{t_idx}")
        params["upsample_net"] = {
            "conv_in": sd.conv1d("upsample_net.conv_in"),
            "upsample": up,
        }
    for i in range(layers):
        params[f"conv_layer_{i}"] = {
            "conv": sd.conv1d(f"conv_layers.{i}.conv"),
            "conv1x1_aux": sd.conv1d(f"conv_layers.{i}.conv1x1_aux"),
            "conv1x1_skip": sd.conv1d(f"conv_layers.{i}.conv1x1_skip"),
            "conv1x1_out": sd.conv1d(f"conv_layers.{i}.conv1x1_out"),
        }
    params["last_conv_0"] = sd.conv1d("last_conv_layers.1")
    params["last_conv_1"] = sd.conv1d("last_conv_layers.3")
    return params


def import_style_melgan_generator(state_dict: Mapping[str, Any],
                                  config: Mapping[str, Any]) -> dict:
    """Map a reference StyleMelGANGenerator state dict."""
    sd = _SD(state_dict)
    noise_scales = config.get("noise_upsample_scales", (11, 2, 2, 2))
    up_scales = config.get("upsample_scales", (2, 2, 2, 2, 2, 2, 2, 2, 1))
    params: dict[str, Any] = {}
    for i in range(len(noise_scales)):
        params[f"noise_upsample_{i}"] = sd.conv_transpose1d(
            f"noise_upsample.{2 * i}")
    for i in range(len(up_scales)):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "tade1": {"aux_conv": sd.conv1d(f"{b}.tade1.aux_conv.0"),
                      "gated_conv": sd.conv1d(f"{b}.tade1.gated_conv.0")},
            "gated_conv1": sd.conv1d(f"{b}.gated_conv1"),
            "tade2": {"aux_conv": sd.conv1d(f"{b}.tade2.aux_conv.0"),
                      "gated_conv": sd.conv1d(f"{b}.tade2.gated_conv.0")},
            "gated_conv2": sd.conv1d(f"{b}.gated_conv2"),
        }
    params["output_conv"] = sd.conv1d("output_conv.0")
    return params


def import_gblock_generator(state_dict: Mapping[str, Any],
                            config: Mapping[str, Any]) -> dict:
    """Map a reference GBlockGenerator state dict."""
    sd = _SD(state_dict)
    g_scales = config.get("g_scales", (8, 8, 2, 2))
    params: dict[str, Any] = {"input_conv": sd.conv1d("input_conv")}
    for i, scale in enumerate(g_scales):
        r = f"resamples.{i}"
        off = 1 if scale > 1 else 0  # Upsample layer shifts Sequential indices
        params[f"resample_{i}"] = {
            "conv1_a": sd.conv1d(f"{r}.conv1.{1 + off}"),
            "conv1_b": sd.conv1d(f"{r}.conv1.{3 + off}"),
            "res1": sd.conv1d(f"{r}.res1.{off}"),
            "conv2_a": sd.conv1d(f"{r}.conv2.1"),
            "conv2_b": sd.conv1d(f"{r}.conv2.3"),
        }
    params["output_conv"] = sd.conv1d("output_conv.1")
    if config.get("use_ar", False):
        params["ar_model"] = {f"fc{li}": sd.linear(f"ar_model.model.{ti}")
                              for li, ti in enumerate([0, 2, 4, 6, 8])}
    if config.get("use_spk_id", False):
        params["spk_emb_mat"] = sd.embedding("spk_emb_mat")
        params["spk_fc"] = sd.linear("spk_fc")
    return params


def _bn(sd: _SD, prefix: str) -> tuple[dict, dict]:
    """torch BatchNorm1d -> (linen params, linen batch_stats)."""
    params = {"scale": sd.sd[f"{prefix}.weight"], "bias": sd.sd[f"{prefix}.bias"]}
    stats = {"mean": sd.sd[f"{prefix}.running_mean"],
             "var": sd.sd[f"{prefix}.running_var"]}
    return params, stats


def _gru_layer(sd: _SD, prefix: str, reverse: bool) -> dict:
    sfx = "_reverse" if reverse else ""
    return {"w_ih": sd.sd[f"{prefix}.weight_ih_l0{sfx}"],
            "w_hh": sd.sd[f"{prefix}.weight_hh_l0{sfx}"],
            "b_ih": sd.sd[f"{prefix}.bias_ih_l0{sfx}"],
            "b_hh": sd.sd[f"{prefix}.bias_hh_l0{sfx}"]}


def import_bigru(state_dict: Mapping[str, Any], config: Mapping[str, Any]
                 ) -> tuple[dict, dict]:
    """Map a reference BiGRU state dict -> (params, batch_stats)."""
    sd = _SD(state_dict)
    params: dict[str, Any] = {}
    for name in ("gru1", "gru2"):
        params[name] = {"fwd": _gru_layer(sd, name, False),
                        "bwd": _gru_layer(sd, name, True)}
    params["fc1"] = sd.linear("fc1.0")
    bn_p, bn_s = _bn(sd, "bn")
    params["bn"] = bn_p
    fc2 = "fc2.0" if sd.has("fc2.0.weight") else "fc2"
    params["fc2"] = sd.linear(fc2)
    if config.get("use_ar", False):
        params["ar_model"] = {f"fc{li}": sd.linear(f"ar_model.model.{ti}")
                              for li, ti in enumerate([0, 2, 4, 6, 8])}
    if config.get("use_spk_emb", False):
        params["spk_fc"] = sd.linear("spk_fc")
    return params, {"batch_stats": {"bn": bn_s}}


def _resblock_bn(sd: _SD, prefix: str, has_residual: bool
                 ) -> tuple[dict, dict]:
    p: dict[str, Any] = {"conv1": sd.conv1d(f"{prefix}.conv1"),
                         "conv2": sd.conv1d(f"{prefix}.conv2")}
    s: dict[str, Any] = {}
    for bn in ("bn1", "bn2"):
        bp, bs = _bn(sd, f"{prefix}.{bn}")
        p[bn] = bp
        s[bn] = bs
    if has_residual:
        p["residual_path"] = sd.conv1d(f"{prefix}.residual_path")
        bp, bs = _bn(sd, f"{prefix}.res_norm")
        p["res_norm"] = bp
        s["res_norm"] = bs
    return p, s


def import_transformer(state_dict: Mapping[str, Any], config: Mapping[str, Any]
                       ) -> tuple[dict, dict]:
    """Map a reference (Gaddy & Klein) Transformer -> (params, batch_stats)."""
    sd = _SD(state_dict)
    elayers = config.get("elayers", 6)
    extra_art = config.get("extra_art", False)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    if extra_art:
        params["front_conv"] = sd.conv1d("conv_blocks.0")
        res_base = 1
    else:
        res_base = 0
    for i in range(3):
        has_res = sd.has(f"conv_blocks.{res_base + i}.residual_path.weight")
        p, s = _resblock_bn(sd, f"conv_blocks.{res_base + i}", has_res)
        params[f"res{i}"] = p
        stats[f"res{i}"] = s
    params["w_raw_in"] = sd.linear("w_raw_in")
    for i in range(elayers):
        t = f"transformer.layers.{i}"
        params[f"layer{i}"] = {
            "self_attn": {
                "w_q": sd.sd[f"{t}.self_attn.w_q"],
                "w_k": sd.sd[f"{t}.self_attn.w_k"],
                "w_v": sd.sd[f"{t}.self_attn.w_v"],
                "w_o": sd.sd[f"{t}.self_attn.w_o"],
                "rel_embeddings": sd.sd[
                    f"{t}.self_attn.relative_positional.embeddings"][..., 0],
            },
            "linear1": sd.linear(f"{t}.linear1"),
            "linear2": sd.linear(f"{t}.linear2"),
            "norm1": {"scale": sd.sd[f"{t}.norm1.weight"],
                      "bias": sd.sd[f"{t}.norm1.bias"]},
            "norm2": {"scale": sd.sd[f"{t}.norm2.weight"],
                      "bias": sd.sd[f"{t}.norm2.bias"]},
        }
    if sd.has("in_emb_mat.weight"):
        params["in_emb_mat"] = sd.embedding("in_emb_mat")
    params["w_out"] = sd.linear("w_out")
    return params, {"batch_stats": stats}


GENERATOR_IMPORTERS = {
    "HiFiGANGenerator": lambda sd, cfg: (import_hifigan_generator(sd, cfg), {}),
    "MelGANGenerator": lambda sd, cfg: (import_melgan_generator(sd, cfg), {}),
    "ParallelWaveGANGenerator": lambda sd, cfg: (import_pwg_generator(sd, cfg), {}),
    "StyleMelGANGenerator": lambda sd, cfg: (
        import_style_melgan_generator(sd, cfg), {}),
    "GBlockGenerator": lambda sd, cfg: (import_gblock_generator(sd, cfg), {}),
    "BiGRU": lambda sd, cfg: import_bigru(sd, cfg),
    "Transformer": lambda sd, cfg: import_transformer(sd, cfg),
}


def _import_melgan_discriminator(sd: _SD, prefix: str, config: Mapping[str, Any]
                                 ) -> dict:
    """Single MelGANDiscriminator (layers Sequential layout):
    [pad, conv, act] first; [conv, act] downsamples + penultimate; plain last."""
    n_down = len(config.get("downsample_scales", (4, 4, 4, 4)))
    disc: dict[str, Any] = {"layer_0": sd.conv1d(f"{prefix}.layers.0.1")}
    for k in range(1, n_down + 2):
        disc[f"layer_{k}"] = sd.conv1d(f"{prefix}.layers.{k}.0")
    disc[f"layer_{n_down + 2}"] = sd.conv1d(f"{prefix}.layers.{n_down + 2}")
    return disc


def import_melgan_msd(state_dict: Mapping[str, Any], config: Mapping[str, Any]
                      ) -> dict:
    """Map a reference MelGANMultiScaleDiscriminator state dict."""
    sd = _SD(state_dict)
    return {f"disc_{i}": _import_melgan_discriminator(
        sd, f"discriminators.{i}", config)
        for i in range(config.get("scales", 3))}


def import_style_melgan_discriminator(state_dict: Mapping[str, Any],
                                      config: Mapping[str, Any]) -> dict:
    """Map a reference StyleMelGANDiscriminator state dict (PQMF filters are
    deterministic buffers and rebuilt on our side)."""
    sd = _SD(state_dict)
    d_params = config.get("discriminator_params", {})
    return {f"disc_{i}": _import_melgan_discriminator(
        sd, f"discriminators.{i}", d_params)
        for i in range(len(config.get("pqmf_params", ((1,),) * 4)))}


def import_pwg_discriminator(state_dict: Mapping[str, Any],
                             config: Mapping[str, Any]) -> dict:
    """Map a reference ParallelWaveGANDiscriminator (flat conv+act Sequential)."""
    sd = _SD(state_dict)
    layers = config.get("layers", 10)
    return {f"conv_{i}": sd.conv1d(f"conv_layers.{2 * i}")
            for i in range(layers)}


DISCRIMINATOR_IMPORTERS = {
    "HiFiGANMultiScaleMultiPeriodDiscriminator":
        lambda sd, cfg: import_hifigan_msmpd(sd, cfg),
    "MelGANMultiScaleDiscriminator": import_melgan_msd,
    "StyleMelGANDiscriminator": import_style_melgan_discriminator,
    "ParallelWaveGANDiscriminator": import_pwg_discriminator,
}


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
