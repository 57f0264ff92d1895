"""Export articulatory_tpu param pytrees as reference (PyTorch) state dicts.

Inverse of utils/torch_import.py — closes the parity loop in the jax->torch
direction: a checkpoint trained with this framework becomes a torch pickle
the REFERENCE's ``load_model`` (reference utils/utils.py:294-372) loads
strictly, so every existing reference workflow (decode.py, predict_wav.py,
fine-tuning via --pretrain) can consume our training runs.

Layout inversions (see torch_import.py for the forward direction):

- Conv1d   ours (K, C_in, C_out)      -> torch (C_out, C_in, K)
- ConvT1d  ours (K, C_in, C_out), pre-flipped -> torch (C_in, C_out, K)
- Conv2d   ours (Kh, Kw, C_in, C_out) -> torch (C_out, C_in, Kh, Kw)
- Linear   ours (in, out)             -> torch (out, in)

Weight-normed layers keep the (g, v) reparameterization as torch
``weight_g``/``weight_v`` tensors; plain layers export ``weight``. The
output dicts hold numpy arrays — ``to_torch_state_dict`` tensorizes them.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x))


class _Flat:
    """Flat torch-style state dict under construction."""

    def __init__(self):
        self.sd: dict[str, np.ndarray] = {}

    def conv1d(self, prefix: str, p: Mapping[str, Any]) -> None:
        if "v" in p:
            self.sd[f"{prefix}.weight_v"] = _np(np.transpose(p["v"], (2, 1, 0)))
            self.sd[f"{prefix}.weight_g"] = _np(np.transpose(p["g"], (2, 1, 0)))
        else:
            self.sd[f"{prefix}.weight"] = _np(np.transpose(p["w"], (2, 1, 0)))
        if "b" in p:
            self.sd[f"{prefix}.bias"] = _np(p["b"])

    def conv_transpose1d(self, prefix: str, p: Mapping[str, Any]) -> None:
        # ours stores the kernel time-flipped (ops/conv.py); un-flip on export
        if "v" in p:
            self.sd[f"{prefix}.weight_v"] = _np(
                np.transpose(p["v"], (1, 2, 0))[:, :, ::-1])
            self.sd[f"{prefix}.weight_g"] = _np(np.transpose(p["g"], (1, 2, 0)))
        else:
            self.sd[f"{prefix}.weight"] = _np(
                np.transpose(p["w"], (1, 2, 0))[:, :, ::-1])
        if "b" in p:
            self.sd[f"{prefix}.bias"] = _np(p["b"])

    def conv2d(self, prefix: str, p: Mapping[str, Any]) -> None:
        if "v" in p:
            self.sd[f"{prefix}.weight_v"] = _np(np.transpose(p["v"], (3, 2, 0, 1)))
            self.sd[f"{prefix}.weight_g"] = _np(np.transpose(p["g"], (3, 2, 0, 1)))
        else:
            self.sd[f"{prefix}.weight"] = _np(np.transpose(p["w"], (3, 2, 0, 1)))
        if "b" in p:
            self.sd[f"{prefix}.bias"] = _np(p["b"])

    def linear(self, prefix: str, p: Mapping[str, Any]) -> None:
        self.sd[f"{prefix}.weight"] = _np(np.transpose(p["w"], (1, 0)))
        if "b" in p:
            self.sd[f"{prefix}.bias"] = _np(p["b"])

    def embedding(self, prefix: str, p: Mapping[str, Any]) -> None:
        self.sd[f"{prefix}.weight"] = _np(p["w"])

    def batch_norm(self, prefix: str, p: Mapping[str, Any],
                   stats: Mapping[str, Any], steps: int = 0) -> None:
        self.sd[f"{prefix}.weight"] = _np(p["scale"])
        self.sd[f"{prefix}.bias"] = _np(p["bias"])
        self.sd[f"{prefix}.running_mean"] = _np(stats["mean"])
        self.sd[f"{prefix}.running_var"] = _np(stats["var"])
        # torch BatchNorm1d tracks batches; required by strict load_state_dict
        self.sd[f"{prefix}.num_batches_tracked"] = np.asarray(steps, np.int64)


def export_hifigan_generator(params: Mapping[str, Any],
                             config: Mapping[str, Any]) -> dict:
    """Our HiFiGANGenerator param tree -> reference state dict
    (inverse of torch_import.import_hifigan_generator)."""
    f = _Flat()
    num_ups = len(config.get("upsample_scales", (8, 8, 2, 2)))
    rks = config.get("resblock_kernel_sizes", (3, 7, 11))
    rdils = config.get("resblock_dilations", ((1, 3, 5),) * 3)
    use_additional = config.get("use_additional_convs", True)

    f.conv1d("input_conv", params["input_conv"])
    for i in range(num_ups):
        f.conv_transpose1d(f"upsamples.{i}.1", params[f"upsample_{i}"])
        for j in range(len(rks)):
            idx = i * len(rks) + j
            block = params[f"block_{i}_{j}"]
            for d in range(len(rdils[j])):
                f.conv1d(f"blocks.{idx}.convs1.{d}.1", block[f"convs1_{d}"])
                if use_additional:
                    f.conv1d(f"blocks.{idx}.convs2.{d}.1", block[f"convs2_{d}"])
    f.conv1d("output_conv.1", params["output_conv"])

    if config.get("use_ar", False):
        for li, ti in enumerate([0, 2, 4, 6, 8]):
            f.linear(f"ar_model.model.{ti}", params["ar_model"][f"fc{li}"])
    if config.get("use_spk_id", False):
        f.embedding("spk_emb_mat", params["spk_emb_mat"])
        f.linear("spk_fc", params["spk_fc"])
    if config.get("use_ph", False):
        f.embedding("ph_emb_mat", params["ph_emb_mat"])
    if config.get("use_ph_loss", False):
        f.linear("ph_fc", params["ph_fc"])
    return f.sd


def export_hifigan_msmpd(params: Mapping[str, Any],
                         config: Mapping[str, Any]) -> dict:
    """Our MSMPD param tree -> reference state dict (inverse of
    torch_import.import_hifigan_msmpd). Scale discs export plain weights —
    the reference's norm application is a no-op on their Conv1d layers
    (reference hifigan.py:645-663 quirk, reproduced in our models)."""
    f = _Flat()
    scales = config.get("scales", 3)
    periods = config.get("periods", (2, 3, 5, 7, 11))
    scale_params = config.get("scale_discriminator_params", {})
    period_params = config.get("period_discriminator_params", {})
    n_scale_layers = len(scale_params.get("downsample_scales", (2, 2, 4, 4, 1))) + 3
    n_period_convs = len(period_params.get("downsample_scales", (3, 3, 3, 3, 1)))

    for i in range(scales):
        disc = params["msd"][f"disc_{i}"]
        for k in range(n_scale_layers):
            prefix = f"msd.discriminators.{i}.layers.{k}"
            # all but the last layer are Sequential(conv, act) in the
            # reference; the last is a bare conv
            sub = f"{prefix}.0" if k < n_scale_layers - 1 else prefix
            f.conv1d(sub, disc[f"layer_{k}"])
    for i in range(len(periods)):
        disc = params["mpd"][f"disc_{i}"]
        for k in range(n_period_convs):
            f.conv2d(f"mpd.discriminators.{i}.convs.{k}.0", disc[f"conv_{k}"])
        f.conv2d(f"mpd.discriminators.{i}.output_conv", disc["output_conv"])
    return f.sd


def export_bigru(params: Mapping[str, Any], mutables: Mapping[str, Any],
                 config: Mapping[str, Any], steps: int = 0) -> dict:
    """Our BiGRU (params, batch_stats) -> reference state dict
    (inverse of torch_import.import_bigru)."""
    f = _Flat()
    for name in ("gru1", "gru2"):
        for key, sfx in (("fwd", ""), ("bwd", "_reverse")):
            layer = params[name][key]
            f.sd[f"{name}.weight_ih_l0{sfx}"] = _np(layer["w_ih"])
            f.sd[f"{name}.weight_hh_l0{sfx}"] = _np(layer["w_hh"])
            f.sd[f"{name}.bias_ih_l0{sfx}"] = _np(layer["b_ih"])
            f.sd[f"{name}.bias_hh_l0{sfx}"] = _np(layer["b_hh"])
    f.linear("fc1.0", params["fc1"])
    bn_stats = mutables.get("batch_stats", mutables).get("bn", {})
    f.batch_norm("bn", params["bn"], bn_stats, steps)
    # reference fc2 is a bare Linear unless use_tanh wraps it in a
    # Sequential (pytorch_models.py:35-38)
    f.linear("fc2.0" if config.get("use_tanh", False) else "fc2",
             params["fc2"])
    if config.get("use_ar", False):
        for li, ti in enumerate([0, 2, 4, 6, 8]):
            f.linear(f"ar_model.model.{ti}", params["ar_model"][f"fc{li}"])
    if config.get("use_spk_emb", False):
        f.linear("spk_fc", params["spk_fc"])
    return f.sd


def export_melgan_generator(params: Mapping[str, Any],
                            config: Mapping[str, Any]) -> dict:
    """Inverse of torch_import.import_melgan_generator (non-causal)."""
    f = _Flat()
    scales = config.get("upsample_scales", (8, 8, 2, 2))
    stacks = config.get("stacks", 3)
    f.conv1d("melgan.1", params["first_conv"])
    idx = 2
    for i in range(len(scales)):
        idx += 1  # activation
        f.conv_transpose1d(f"melgan.{idx}", params[f"upsample_{i}"])
        idx += 1
        for j in range(stacks):
            stack = params[f"stack_{i}_{j}"]
            f.conv1d(f"melgan.{idx}.stack.2", stack["conv_dilated"])
            f.conv1d(f"melgan.{idx}.stack.4", stack["conv_out"])
            f.conv1d(f"melgan.{idx}.skip_layer", stack["conv_skip"])
            idx += 1
    idx += 2  # final activation + pad layer
    f.conv1d(f"melgan.{idx}", params["last_conv"])
    return f.sd


def _unfold_conv2d_wn(f: _Flat, prefix: str, w_ours: np.ndarray) -> None:
    """Synthesize a (weight_g, weight_v) pair whose folded product equals the
    stored effective Conv2d weight (import folds weight norm; g*v/||v|| == w
    when v = w and g = ||w|| per output channel)."""
    w = np.transpose(np.asarray(w_ours), (3, 2, 0, 1))  # -> torch layout
    g = np.sqrt((w ** 2).sum(axis=(1, 2, 3), keepdims=True))
    f.sd[f"{prefix}.weight_v"] = _np(w)
    f.sd[f"{prefix}.weight_g"] = _np(g)


def export_pwg_generator(params: Mapping[str, Any],
                         config: Mapping[str, Any]) -> dict:
    """Inverse of torch_import.import_pwg_generator."""
    f = _Flat()
    layers = config.get("layers", 30)
    up_params = config.get("upsample_params", {"upsample_scales": [4, 4, 4, 4]})
    scales = up_params.get("upsample_scales", [4, 4, 4, 4])
    has_act = up_params.get("nonlinear_activation") is not None
    f.conv1d("first_conv", params["first_conv"])
    if config.get("upsample_conditional_features", True):
        stride = 3 if has_act else 2
        for i in range(len(scales)):
            t_idx = 1 + i * stride
            _unfold_conv2d_wn(f, f"upsample_net.upsample.up_layers.{t_idx}",
                              params["upsample_net"]["upsample"][f"conv_{i}_w"])
        f.conv1d("upsample_net.conv_in", params["upsample_net"]["conv_in"])
    for i in range(layers):
        layer = params[f"conv_layer_{i}"]
        f.conv1d(f"conv_layers.{i}.conv", layer["conv"])
        f.conv1d(f"conv_layers.{i}.conv1x1_aux", layer["conv1x1_aux"])
        f.conv1d(f"conv_layers.{i}.conv1x1_skip", layer["conv1x1_skip"])
        f.conv1d(f"conv_layers.{i}.conv1x1_out", layer["conv1x1_out"])
    f.conv1d("last_conv_layers.1", params["last_conv_0"])
    f.conv1d("last_conv_layers.3", params["last_conv_1"])
    return f.sd


def export_style_melgan_generator(params: Mapping[str, Any],
                                  config: Mapping[str, Any]) -> dict:
    """Inverse of torch_import.import_style_melgan_generator."""
    f = _Flat()
    noise_scales = config.get("noise_upsample_scales", (11, 2, 2, 2))
    up_scales = config.get("upsample_scales", (2, 2, 2, 2, 2, 2, 2, 2, 1))
    for i in range(len(noise_scales)):
        f.conv_transpose1d(f"noise_upsample.{2 * i}",
                           params[f"noise_upsample_{i}"])
    for i in range(len(up_scales)):
        b = f"blocks.{i}"
        blk = params[f"block_{i}"]
        f.conv1d(f"{b}.tade1.aux_conv.0", blk["tade1"]["aux_conv"])
        f.conv1d(f"{b}.tade1.gated_conv.0", blk["tade1"]["gated_conv"])
        f.conv1d(f"{b}.gated_conv1", blk["gated_conv1"])
        f.conv1d(f"{b}.tade2.aux_conv.0", blk["tade2"]["aux_conv"])
        f.conv1d(f"{b}.tade2.gated_conv.0", blk["tade2"]["gated_conv"])
        f.conv1d(f"{b}.gated_conv2", blk["gated_conv2"])
    f.conv1d("output_conv.0", params["output_conv"])
    return f.sd


def export_gblock_generator(params: Mapping[str, Any],
                            config: Mapping[str, Any]) -> dict:
    """Inverse of torch_import.import_gblock_generator."""
    f = _Flat()
    g_scales = config.get("g_scales", (8, 8, 2, 2))
    f.conv1d("input_conv", params["input_conv"])
    for i, scale in enumerate(g_scales):
        r = f"resamples.{i}"
        off = 1 if scale > 1 else 0  # Upsample layer shifts Sequential indices
        blk = params[f"resample_{i}"]
        f.conv1d(f"{r}.conv1.{1 + off}", blk["conv1_a"])
        f.conv1d(f"{r}.conv1.{3 + off}", blk["conv1_b"])
        f.conv1d(f"{r}.res1.{off}", blk["res1"])
        f.conv1d(f"{r}.conv2.1", blk["conv2_a"])
        f.conv1d(f"{r}.conv2.3", blk["conv2_b"])
    f.conv1d("output_conv.1", params["output_conv"])
    if config.get("use_ar", False):
        for li, ti in enumerate([0, 2, 4, 6, 8]):
            f.linear(f"ar_model.model.{ti}", params["ar_model"][f"fc{li}"])
    if config.get("use_spk_id", False):
        f.embedding("spk_emb_mat", params["spk_emb_mat"])
        f.linear("spk_fc", params["spk_fc"])
    return f.sd


def _export_resblock_bn(f: _Flat, prefix: str, p: Mapping[str, Any],
                        s: Mapping[str, Any], steps: int) -> None:
    f.conv1d(f"{prefix}.conv1", p["conv1"])
    f.conv1d(f"{prefix}.conv2", p["conv2"])
    for bn in ("bn1", "bn2"):
        f.batch_norm(f"{prefix}.{bn}", p[bn], s[bn], steps)
    if "residual_path" in p:
        f.conv1d(f"{prefix}.residual_path", p["residual_path"])
        f.batch_norm(f"{prefix}.res_norm", p["res_norm"], s["res_norm"], steps)


def export_transformer(params: Mapping[str, Any], mutables: Mapping[str, Any],
                       config: Mapping[str, Any], steps: int = 0) -> dict:
    """Inverse of torch_import.import_transformer."""
    f = _Flat()
    elayers = config.get("elayers", 6)
    extra_art = config.get("extra_art", False)
    stats = mutables.get("batch_stats", mutables)
    res_base = 0
    if extra_art:
        f.conv1d("conv_blocks.0", params["front_conv"])
        res_base = 1
    for i in range(3):
        _export_resblock_bn(f, f"conv_blocks.{res_base + i}",
                            params[f"res{i}"], stats[f"res{i}"], steps)
    f.linear("w_raw_in", params["w_raw_in"])
    for i in range(elayers):
        t = f"transformer.layers.{i}"
        layer = params[f"layer{i}"]
        attn = layer["self_attn"]
        for k in ("w_q", "w_k", "w_v", "w_o"):
            f.sd[f"{t}.self_attn.{k}"] = _np(attn[k])
        f.sd[f"{t}.self_attn.relative_positional.embeddings"] = _np(
            np.asarray(attn["rel_embeddings"])[..., None])
        f.linear(f"{t}.linear1", layer["linear1"])
        f.linear(f"{t}.linear2", layer["linear2"])
        for norm in ("norm1", "norm2"):
            f.sd[f"{t}.{norm}.weight"] = _np(layer[norm]["scale"])
            f.sd[f"{t}.{norm}.bias"] = _np(layer[norm]["bias"])
    if "in_emb_mat" in params:
        f.embedding("in_emb_mat", params["in_emb_mat"])
    f.linear("w_out", params["w_out"])
    return f.sd


def _export_melgan_discriminator(f: _Flat, prefix: str, disc: Mapping[str, Any],
                                 config: Mapping[str, Any]) -> None:
    n_down = len(config.get("downsample_scales", (4, 4, 4, 4)))
    f.conv1d(f"{prefix}.layers.0.1", disc["layer_0"])
    for k in range(1, n_down + 2):
        f.conv1d(f"{prefix}.layers.{k}.0", disc[f"layer_{k}"])
    f.conv1d(f"{prefix}.layers.{n_down + 2}", disc[f"layer_{n_down + 2}"])


def export_melgan_msd(params: Mapping[str, Any],
                      config: Mapping[str, Any]) -> dict:
    """Inverse of torch_import.import_melgan_msd."""
    f = _Flat()
    for i in range(config.get("scales", 3)):
        _export_melgan_discriminator(f, f"discriminators.{i}",
                                     params[f"disc_{i}"], config)
    return f.sd


def export_style_melgan_discriminator(params: Mapping[str, Any],
                                      config: Mapping[str, Any]) -> dict:
    """Inverse of torch_import.import_style_melgan_discriminator."""
    f = _Flat()
    d_params = config.get("discriminator_params", {})
    for i in range(len(config.get("pqmf_params", ((1,),) * 4))):
        _export_melgan_discriminator(f, f"discriminators.{i}",
                                     params[f"disc_{i}"], d_params)
    return f.sd


def export_pwg_discriminator(params: Mapping[str, Any],
                             config: Mapping[str, Any]) -> dict:
    """Inverse of torch_import.import_pwg_discriminator."""
    f = _Flat()
    for i in range(config.get("layers", 10)):
        f.conv1d(f"conv_layers.{2 * i}", params[f"conv_{i}"])
    return f.sd


GENERATOR_EXPORTERS = {
    "HiFiGANGenerator":
        lambda p, m, cfg, steps=0: export_hifigan_generator(p, cfg),
    "BiGRU": export_bigru,
    "MelGANGenerator":
        lambda p, m, cfg, steps=0: export_melgan_generator(p, cfg),
    "ParallelWaveGANGenerator":
        lambda p, m, cfg, steps=0: export_pwg_generator(p, cfg),
    "StyleMelGANGenerator":
        lambda p, m, cfg, steps=0: export_style_melgan_generator(p, cfg),
    "GBlockGenerator":
        lambda p, m, cfg, steps=0: export_gblock_generator(p, cfg),
    "Transformer": export_transformer,
}

DISCRIMINATOR_EXPORTERS = {
    "HiFiGANMultiScaleMultiPeriodDiscriminator": export_hifigan_msmpd,
    "MelGANMultiScaleDiscriminator": export_melgan_msd,
    "StyleMelGANDiscriminator": export_style_melgan_discriminator,
    "ParallelWaveGANDiscriminator": export_pwg_discriminator,
}


def to_torch_state_dict(flat: Mapping[str, np.ndarray]) -> "dict":
    """numpy state dict -> torch tensors (CPU)."""
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in flat.items()}


def export_checkpoint(payload: Mapping[str, Any],
                      config: Mapping[str, Any]) -> dict:
    """Our checkpoint payload (utils/checkpoint.py layout) -> a reference
    torch-pickle payload {model: {generator[, discriminator]}, steps, epochs}.

    The reference's ``load_model`` reads model.generator only; its Trainer
    resume additionally expects torch optimizer/scheduler states, which have
    no faithful optax equivalent — we emit empty dicts there (fine-tune our
    exports on the reference side via --pretrain, which loads params only,
    reference train.py:178-214).
    """
    from articulatory_tpu.config import fix_generator_params

    gen_type = config.get("generator_type", "ParallelWaveGANGenerator")
    if gen_type not in GENERATOR_EXPORTERS:
        raise NotImplementedError(
            f"no torch exporter for generator {gen_type} "
            f"(available: {sorted(GENERATOR_EXPORTERS)})")
    gen_params = fix_generator_params(config["generator_params"])
    steps = int(payload.get("steps", 0))
    mutables = payload.get("mutables", {}).get("generator", {}) or {}
    flat_g = GENERATOR_EXPORTERS[gen_type](
        payload["model"]["generator"], mutables, gen_params, steps)
    out = {
        "model": {"generator": to_torch_state_dict(flat_g)},
        "optimizer": {},
        "scheduler": {},
        "steps": steps,
        "epochs": int(payload.get("epochs", 0)),
    }
    if "generator2_type" in config and payload["model"].get("generator2"):
        gen2_type = config["generator2_type"]
        if gen2_type not in GENERATOR_EXPORTERS:
            raise NotImplementedError(
                f"no torch exporter for generator2 {gen2_type} "
                f"(available: {sorted(GENERATOR_EXPORTERS)})")
        gen2_params = fix_generator_params(config["generator2_params"])
        mutables2 = payload.get("mutables", {}).get("generator2", {}) or {}
        flat_g2 = GENERATOR_EXPORTERS[gen2_type](
            payload["model"]["generator2"], mutables2, gen2_params, steps)
        # the reference saves generator2 as a 1-TUPLE (trailing-comma quirk,
        # reference train.py:165,172) and its load_model(generator2=True)
        # indexes ["generator2"][0] (utils.py:335-338) — reproduce exactly
        out["model"]["generator2"] = (to_torch_state_dict(flat_g2),)
    disc_type = config.get("discriminator_type")
    if disc_type in DISCRIMINATOR_EXPORTERS and \
            payload.get("model", {}).get("discriminator"):
        flat_d = DISCRIMINATOR_EXPORTERS[disc_type](
            payload["model"]["discriminator"],
            config.get("discriminator_params", {}))
        out["model"]["discriminator"] = to_torch_state_dict(flat_d)
    return out
