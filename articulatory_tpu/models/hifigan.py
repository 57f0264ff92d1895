"""HiFi-GAN generator + discriminators, TPU-native (flax.linen, NLC layout).

Parity target: reference articulatory/models/hifigan.py. Notable semantics
preserved exactly:

- MRF resblock outputs are *averaged* (``cs / num_blocks``, reference
  hifigan.py:230), unlike official HiFi-GAN's sum.
- The AR conditioning vector from ``PastFCEncoder`` is tiled over time and
  concatenated to the input features (hifigan.py:208-211); the configured
  ``in_channels`` already includes ``ar_output``.
- Output conv uses LeakyReLU with the default 0.01 slope (hifigan.py:147).
- The scale discriminator's weight/spectral norm is a no-op in the reference
  (applied to Conv2d while the stack is Conv1d, hifigan.py:645-663); we
  reproduce the effective behavior: **no norm** on scale-discriminator convs.
- Period discriminator's final conv has kernel ``(kernel_sizes[1]-1, 1)``
  (even kernel, hifigan.py:382) and flattens to (B, T').
- Extra config keys the reference CAR yaml passes but the constructor does
  not accept (``final_scale``, ``extra_art``) are accepted and ignored.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.layers.activations import get_activation
from articulatory_tpu.layers.conv import Conv1d, Conv2d, ConvTranspose1d, Dense, Embed
from articulatory_tpu.layers.past_encoder import PastFCEncoder
from articulatory_tpu.layers.residual import HiFiGANResidualBlock

Array = jax.Array


class HiFiGANGenerator(nn.Module):
    """HiFi-GAN generator: input conv → N×(upsample + MRF) → output conv.

    Input ``c``: (B, T, in_channels - ar_output if use_ar else in_channels).
    Output: (B, T * prod(upsample_scales), out_channels).
    """

    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    paddings: Sequence[Any] | None = None
    output_paddings: Sequence[Any] | None = None
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_additional_convs: bool = True
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    use_weight_norm: bool = True
    use_ar: bool = False
    ar_input: int = 512
    ar_hidden: int = 256
    ar_output: int = 128
    use_tanh: bool = True
    use_spk_id: bool = False
    num_spk: int | None = None
    spk_emb_size: int = 32
    use_ph: bool = False
    num_ph: int | None = None
    ph_emb_size: int = 8
    use_ph_loss: bool = False
    # compute dtype for the conv stack (e.g. jnp.bfloat16); params stay f32,
    # output is cast back to f32. None = full f32.
    compute_dtype: Any = None
    # hybrid precision (only meaningful with compute_dtype=bfloat16): keep
    # the input conv, the FINAL upsample+MRF stage, and the output conv in
    # f32, running only the interior stages in bf16. Rationale: full-bf16
    # CAR decode fails the 0.1 dB MCD budget through AR-feedback error
    # amplification (docs/DESIGN.md §7: per-chunk 0.40 dB -> 9.1 dB after
    # feedback); the last stage + output conv produce the waveform the AR
    # ring consumes, so keeping them (and the conditioning head) in f32
    # targets the feedback path while the wide interior keeps the bf16
    # MXU win. The PastFCEncoder AR encoder always runs f32 (pre-cast).
    hybrid_precision: bool = False
    # per-stage space-to-depth packing factors for the MRF resblocks
    # (ops/packed_conv.py): numerically identical (diff ~2e-4 fp reorder).
    # Measured on v5e: -24% generator forward at training shapes (32x8000)
    # and 21.0M -> 25.4M samples/s on chunked-AR decode (docs/DESIGN.md §7);
    # shipped recipes set the top-level `time_packing: auto` config key
    # (config.py::inject_time_packing). "auto" = 128 // stage_channels,
    # capped at 4. Default None = unpacked (construction-kwarg level).
    time_packing: Sequence[int] | str | None = None
    # accepted-and-ignored reference config quirks (e2w_hifigan_car.yaml:42,54)
    final_scale: Any = None
    extra_art: Any = None

    def _paddings(self) -> tuple[list[int], list[int]]:
        scales = list(self.upsample_scales)
        pads = [s // 2 + s % 2 for s in scales]
        out_pads = [s % 2 for s in scales]
        if self.paddings is not None:
            assert all(p == "default" for p in self.paddings), \
                "only 'default' paddings are implemented (as in the reference)"
        if self.output_paddings is not None:
            assert all(p == "default" for p in self.output_paddings), \
                "only 'default' output_paddings are implemented"
        return pads, out_pads

    @property
    def num_pipeline_stages(self) -> int:
        """Stage 0 = conditioning + input conv; stages 1..U = one upsample +
        MRF group each; stage U+1 = output conv (+ optional ph head)."""
        return len(self.upsample_scales) + 2

    def __call__(self, c: Array, spk_id: Array | None = None,
                 ar: Array | None = None, ph: Array | None = None):
        return self.run_stages(c, 0, self.num_pipeline_stages,
                               spk_id=spk_id, ar=ar, ph=ph)

    @nn.compact
    def run_stages(self, c: Array, start_stage: int, stop_stage: int,
                   spk_id: Array | None = None, ar: Array | None = None,
                   ph: Array | None = None):
        """Run pipeline stages ``[start_stage, stop_stage)`` only.

        ``run_stages(x, 0, num_pipeline_stages)`` is exactly the full forward;
        chaining contiguous ranges reproduces it bit-for-bit (stage handoffs
        are the raw inter-stage activations, dtype preserved). This is the
        substrate for pipeline-parallel serving (parallel/pp.py) — the
        reference has no pipeline parallelism (SURVEY.md §2.10).
        """
        assert self.kernel_size % 2 == 1, "Kernel size must be odd number."
        assert len(self.upsample_scales) == len(self.upsample_kernel_sizes)
        assert len(self.resblock_dilations) == len(self.resblock_kernel_sizes)
        if not 0 <= start_stage < stop_stage <= self.num_pipeline_stages:
            raise ValueError(
                f"stage range [{start_stage}, {stop_stage}) is not a "
                f"non-empty subrange of [0, {self.num_pipeline_stages})")
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.1})
        pads, out_pads = self._paddings()
        num_blocks = len(self.resblock_kernel_sizes)

        from articulatory_tpu.ops.packed_conv import pack_time, unpack_time

        # with weight norm OFF the reference's post-norm N(0, 0.01) reset is
        # effective (it is a no-op only under weight norm) — mirror that
        # regime, same as gblock_gen.py
        kinit = "torch_default" if self.use_weight_norm else "normal:0.01"

        if start_stage == 0:
            if self.use_ar:
                ar_feats = PastFCEncoder(input_len=self.ar_input,
                                         hidden_dim=self.ar_hidden,
                                         output_dim=self.ar_output,
                                         name="ar_model")(ar)  # (B, ar_output)
                ar_feats = jnp.broadcast_to(ar_feats[:, None, :],
                                            (c.shape[0], c.shape[1], self.ar_output))
                c = jnp.concatenate([c, ar_feats], axis=-1)
            if self.use_spk_id:
                assert self.num_spk is not None
                spk_emb = Embed(self.num_spk, self.spk_emb_size, name="spk_emb_mat")(spk_id)
                spk_emb = Dense(self.in_channels, name="spk_fc")(spk_emb)
                c = c + spk_emb[:, None, :]
            if self.use_ph:
                assert self.num_ph is not None
                ph_feats = Embed(self.num_ph, self.ph_emb_size, name="ph_emb_mat")(ph)
                c = jnp.concatenate([c, ph_feats], axis=-1)

            head_dt = None if self.hybrid_precision else self.compute_dtype
            if head_dt is not None:
                c = c.astype(head_dt)
            c = Conv1d(self.channels, self.kernel_size,
                       padding=(self.kernel_size - 1) // 2, use_bias=True,
                       use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                       dtype=head_dt, name="input_conv")(c)
        n_up = len(self.upsample_scales)
        for i in range(n_up):
            if not (start_stage <= i + 1 < stop_stage):
                continue
            # hybrid precision: final upsample+MRF stage stays f32 (it feeds
            # the AR ring)
            stage_dt = (None if self.hybrid_precision and i == n_up - 1
                        else self.compute_dtype)
            ch = self.channels // (2 ** (i + 1))
            if stage_dt is None and c.dtype == jnp.bfloat16:
                c = c.astype(jnp.float32)  # bf16 interior -> f32 tail
            c = act(c)
            c = ConvTranspose1d(ch, self.upsample_kernel_sizes[i],
                                stride=self.upsample_scales[i], padding=pads[i],
                                output_padding=out_pads[i],
                                use_weight_norm=self.use_weight_norm,
                                kernel_init=kinit,
                                dtype=stage_dt,
                                name=f"upsample_{i}")(c)
            if self.time_packing is None:
                p = 1
            elif self.time_packing == "auto":
                p = min(4, max(1, 128 // ch))
            else:
                p = int(self.time_packing[i])
            if p > 1 and c.shape[1] % p != 0:
                p = 1  # stage length not divisible: fall back to unpacked
            if p > 1:
                c = pack_time(c, p)
            cs = 0.0
            for j in range(num_blocks):
                cs += HiFiGANResidualBlock(
                    kernel_size=self.resblock_kernel_sizes[j], channels=ch,
                    dilations=self.resblock_dilations[j], use_bias=self.bias,
                    use_additional_convs=self.use_additional_convs,
                    nonlinear_activation=self.nonlinear_activation,
                    nonlinear_activation_params=(self.nonlinear_activation_params
                                                 or {"negative_slope": 0.1}),
                    use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                    compute_dtype=stage_dt, time_pack=p,
                    name=f"block_{i}_{j}")(c)
            c = cs / num_blocks
            if p > 1:
                c = unpack_time(c, p)

        if stop_stage < self.num_pipeline_stages:
            return c  # inter-stage activation handoff (dtype preserved)

        pre_out = c
        # reference output conv uses torch's default LeakyReLU slope (0.01)
        out = jnp.where(pre_out >= 0, pre_out, 0.01 * pre_out)
        out = Conv1d(self.out_channels, self.kernel_size,
                     padding=(self.kernel_size - 1) // 2,
                     use_weight_norm=self.use_weight_norm, kernel_init=kinit,
                     dtype=(None if self.hybrid_precision
                            else self.compute_dtype),
                     name="output_conv")(out)
        if self.use_tanh:
            out = jnp.tanh(out)
        out = out.astype(jnp.promote_types(out.dtype, jnp.float32))

        if self.use_ph_loss:
            final_scale = int(np.prod(self.upsample_scales))
            assert final_scale % 2 == 0
            ph_out = Dense(self.num_ph, name="ph_fc")(pre_out)  # (B, T, num_ph)
            ph_out = _avg_pool1d(ph_out, kernel_size=final_scale * 2,
                                 stride=final_scale, padding=final_scale // 2)
            return out, ph_out
        return out

    def inference(self, variables, c: Array, ar: Array | None = None,
                  spk_id: Array | None = None, ph: Array | None = None) -> Array:
        """(T, in_feats) -> (T * prod(scales), out_channels)."""
        out = self.apply(variables, c[None], spk_id=spk_id, ar=ar, ph=ph)
        if isinstance(out, tuple):
            out = out[0]
        return out[0]


def _avg_pool1d(x: Array, kernel_size: int, stride: int, padding: int) -> Array:
    """torch.nn.AvgPool1d semantics (count_include_pad=True) over NLC time
    axis; single implementation shared with MelGAN."""
    from articulatory_tpu.models.melgan import avg_pool1d

    return avg_pool1d(x, kernel_size, stride, padding,
                      count_include_pad=True)


class HiFiGANPeriodDiscriminator(nn.Module):
    """Reshape (B, T, C) to (B, T/P, P, C)-as-image and run a Conv2d stack.

    Returns the list of all layer feature maps (last entry flattened logits).
    """

    in_channels: int = 1
    out_channels: int = 1
    period: int = 3
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 32
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)
    max_downsample_channels: int = 1024
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    use_weight_norm: bool = True
    use_spectral_norm: bool = False
    # compute dtype for the conv stack (e.g. jnp.bfloat16); params stay f32
    # and every returned feature map is cast back to f32 so loss math and
    # feature matching stay full precision. None = full f32.
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        assert len(self.kernel_sizes) == 2
        assert self.kernel_sizes[0] % 2 == 1 and self.kernel_sizes[1] % 2 == 1
        if self.use_weight_norm and self.use_spectral_norm:
            raise ValueError("Either use use_weight_norm or use_spectral_norm.")
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.1})
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, [(0, 0), (0, n_pad), (0, 0)], mode="reflect")
            t += n_pad
        # (B, T/P, P, C): height = T/P, width = P, channels = C
        x = x.reshape(b, t // self.period, self.period, c)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)

        outs = []
        in_chs = self.in_channels
        out_chs = self.channels
        for i, scale in enumerate(self.downsample_scales):
            x = Conv2d(out_chs, (self.kernel_sizes[0], 1), stride=(scale, 1),
                       padding=((self.kernel_sizes[0] - 1) // 2, 0),
                       use_bias=self.bias,
                       use_weight_norm=self.use_weight_norm,
                       use_spectral_norm=self.use_spectral_norm,
                       dtype=self.compute_dtype,
                       name=f"conv_{i}")(x)
            x = act(x)
            outs.append(x.astype(jnp.promote_types(x.dtype, jnp.float32)))
            in_chs = out_chs
            out_chs = min(out_chs * 4, self.max_downsample_channels)
        x = Conv2d(self.out_channels, (self.kernel_sizes[1] - 1, 1),
                   padding=((self.kernel_sizes[1] - 1) // 2, 0),
                   use_weight_norm=self.use_weight_norm,
                   use_spectral_norm=self.use_spectral_norm,
                   dtype=self.compute_dtype,
                   name="output_conv")(x)
        outs.append(x.reshape(b, -1).astype(jnp.promote_types(x.dtype, jnp.float32)))
        return outs


class HiFiGANMultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    discriminator_params: dict = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        params = dict(self.discriminator_params or {})
        params.setdefault("compute_dtype", self.compute_dtype)
        outs = []
        for i, period in enumerate(self.periods):
            p = dict(params)
            p["period"] = period
            outs.append(HiFiGANPeriodDiscriminator(**p, name=f"disc_{i}")(x))
        return outs


class HiFiGANScaleDiscriminator(nn.Module):
    """Grouped-conv downsampling stack over raw waveform.

    NOTE: matching the reference's effective behavior, *no* weight/spectral
    norm is applied here (the reference's norm application targets Conv2d
    modules which do not exist in this stack — hifigan.py:645-663).
    """

    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    bias: bool = True
    downsample_scales: Sequence[int] = (2, 2, 4, 4, 1)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: dict = None
    use_weight_norm: bool = True   # accepted for config parity; no-op (see note)
    use_spectral_norm: bool = False
    # compute dtype (see HiFiGANPeriodDiscriminator.compute_dtype)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        assert len(self.kernel_sizes) == 4
        assert all(ks % 2 == 1 for ks in self.kernel_sizes)
        act = get_activation(self.nonlinear_activation,
                             self.nonlinear_activation_params or {"negative_slope": 0.1})
        outs = []
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        x = Conv1d(self.channels, self.kernel_sizes[0],
                   padding=(self.kernel_sizes[0] - 1) // 2, use_bias=self.bias,
                   dtype=self.compute_dtype, name="layer_0")(x)
        x = act(x)
        outs.append(x.astype(jnp.promote_types(x.dtype, jnp.float32)))

        in_chs = self.channels
        out_chs = self.channels
        groups = 4
        li = 1
        for scale in self.downsample_scales:
            x = Conv1d(out_chs, self.kernel_sizes[1], stride=scale,
                       padding=(self.kernel_sizes[1] - 1) // 2, groups=groups,
                       use_bias=self.bias, dtype=self.compute_dtype,
                       name=f"layer_{li}")(x)
            x = act(x)
            outs.append(x.astype(jnp.promote_types(x.dtype, jnp.float32)))
            li += 1
            in_chs = out_chs
            out_chs = min(in_chs * 2, self.max_downsample_channels)
            groups = min(groups * 4, self.max_groups)

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        x = Conv1d(out_chs, self.kernel_sizes[2],
                   padding=(self.kernel_sizes[2] - 1) // 2, use_bias=self.bias,
                   dtype=self.compute_dtype, name=f"layer_{li}")(x)
        x = act(x)
        outs.append(x.astype(jnp.promote_types(x.dtype, jnp.float32)))
        x = Conv1d(self.out_channels, self.kernel_sizes[3],
                   padding=(self.kernel_sizes[3] - 1) // 2, use_bias=self.bias,
                   dtype=self.compute_dtype, name=f"layer_{li + 1}")(x)
        outs.append(x.astype(jnp.promote_types(x.dtype, jnp.float32)))
        return outs


class HiFiGANMultiScaleDiscriminator(nn.Module):
    scales: int = 3
    downsample_pooling: str = "AvgPool1d"
    downsample_pooling_params: dict = None
    discriminator_params: dict = None
    follow_official_norm: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        pool_params = self.downsample_pooling_params or {
            "kernel_size": 4, "stride": 2, "padding": 2}
        params = dict(self.discriminator_params or {})
        params.setdefault("compute_dtype", self.compute_dtype)
        outs = []
        for i in range(self.scales):
            p = dict(params)
            if self.follow_official_norm:
                # reference toggles weight/spectral norm per scale; both are
                # effectively no-ops in the scale stack (see class note)
                p["use_weight_norm"] = i != 0
                p["use_spectral_norm"] = i == 0
            outs.append(HiFiGANScaleDiscriminator(**p, name=f"disc_{i}")(x))
            x = _avg_pool1d(x, pool_params["kernel_size"], pool_params["stride"],
                            pool_params["padding"])
        return outs


class HiFiGANMultiScaleMultiPeriodDiscriminator(nn.Module):
    """MSD outputs + MPD outputs concatenated (reference hifigan.py:741-825)."""

    scales: int = 3
    scale_downsample_pooling: str = "AvgPool1d"
    scale_downsample_pooling_params: dict = None
    scale_discriminator_params: dict = None
    follow_official_norm: bool = True
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    period_discriminator_params: dict = None
    # compute dtype for every sub-discriminator's conv stack (params stay
    # f32, feature maps/logits cast back to f32 — see the sub-classes)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        msd_outs = HiFiGANMultiScaleDiscriminator(
            scales=self.scales,
            downsample_pooling=self.scale_downsample_pooling,
            downsample_pooling_params=self.scale_downsample_pooling_params,
            discriminator_params=self.scale_discriminator_params,
            follow_official_norm=self.follow_official_norm,
            compute_dtype=self.compute_dtype,
            name="msd")(x)
        mpd_outs = HiFiGANMultiPeriodDiscriminator(
            periods=self.periods,
            discriminator_params=self.period_discriminator_params,
            compute_dtype=self.compute_dtype,
            name="mpd")(x)
        return msd_outs + mpd_outs
