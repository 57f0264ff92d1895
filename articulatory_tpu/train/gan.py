"""The jitted GAN training step — the heart of the framework.

Reproduces the reference's per-step semantics (bin/train.py:241-440) as one
pure function suitable for jit/pjit over a device mesh:

1. generator update (gated by ``steps > generator_train_start_steps``):
   aux losses (multi-res STFT / subband STFT / mel-or-L1) * lambda_aux
   + lambda_ph * phoneme CE
   + lambda_adv * (adversarial + lambda_feat_match * feature matching),
   where the adversarial block participates only once
   ``steps > discriminator_train_start_steps``;
2. the fake is REGENERATED with the *updated* generator params under
   stop_gradient ("leads better quality", train.py:389-390);
3. discriminator update on real/fake (gated like the adv block).

Step-count gating is implemented with masked updates (jnp.where over the
param/opt pytrees) instead of Python branches, so a single compiled
executable serves all phases. The learning rates enter as traced scalars,
so host-side schedulers (incl. ReduceLROnPlateau) never force a retrace.

Cascade note: with ``generator2_type`` the reference's optimizer only holds
stage-1 generator params (train.py:1760-1769) — generator2 is frozen
(typically loaded via --pretrain2). Mirrored here.
"""

from __future__ import annotations

import inspect
import logging
from typing import Any, Callable

import flax
import flax.struct
import jax
import jax.numpy as jnp
import optax

from articulatory_tpu.losses import (
    DiscriminatorAdversarialLoss,
    FeatureMatchLoss,
    GeneratorAdversarialLoss,
    MelSpectrogramLoss,
    MultiResolutionSTFTLoss,
)
from articulatory_tpu.ops.interp import interpolate_linear
from articulatory_tpu.ops.pqmf import PQMF

Array = jax.Array

INVERSION_MODES = ("art", "a2m", "w2a", "m2a", "ph2a", "ph2m")


@flax.struct.dataclass
class GANTrainState:
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    steps: Array  # int32 scalar
    params_g2: Any = None
    mutables_g: Any = flax.struct.field(default_factory=dict)
    mutables_d: Any = flax.struct.field(default_factory=dict)


def _accepts(model, kwarg: str) -> bool:
    try:
        sig = inspect.signature(type(model).__call__)
    except (TypeError, ValueError):
        return False
    return kwarg in sig.parameters


class GANCriterion:
    """Loss bundle built from the experiment config (train.py:1675-1748)."""

    def __init__(self, config: dict):
        self.config = config
        self.gen_adv = GeneratorAdversarialLoss(
            **config.get("generator_adv_loss_params", {}))
        self.dis_adv = DiscriminatorAdversarialLoss(
            **config.get("discriminator_adv_loss_params", {}))
        self.use_stft_loss = config.get("use_stft_loss", True)
        if self.use_stft_loss:
            self.stft = MultiResolutionSTFTLoss(**config.get("stft_loss_params", {}))
        self.use_subband_stft_loss = config.get("use_subband_stft_loss", False)
        if self.use_subband_stft_loss:
            assert config["generator_params"]["out_channels"] > 1
            self.sub_stft = MultiResolutionSTFTLoss(
                **config.get("subband_stft_loss_params", {}))
        self.use_feat_match_loss = config.get("use_feat_match_loss", False)
        if self.use_feat_match_loss:
            self.feat_match = FeatureMatchLoss(
                **config.get("feat_match_loss_params", {}))
        self.use_mel_loss = config.get("use_mel_loss", False)
        self.mel_is_l1 = config.get("dataset_mode") in INVERSION_MODES
        if self.use_mel_loss and not self.mel_is_l1:
            mel_params = config.get("mel_loss_params")
            if mel_params is None:
                mel_params = dict(
                    fs=config["sampling_rate"], fft_size=config["fft_size"],
                    hop_size=config["hop_size"], win_length=config["win_length"],
                    window=config["window"], num_mels=config["num_mels"],
                    fmin=config["fmin"], fmax=config["fmax"])
            self.mel = MelSpectrogramLoss(**mel_params)
        # gate matches reference train.py:1735 (generator_params.use_ph_loss);
        # in a cascade the ph head lives on generator2, so honor its flag too
        self.use_ph_loss = (
            config.get("generator_params", {}).get("use_ph_loss", False)
            or (config.get("generator2_type") is not None
                and config.get("generator2_params", {}).get("use_ph_loss",
                                                            False)))
        self.use_pcd = config.get("use_pcd", False)
        if config.get("use_inter_loss", False):
            logging.warning(
                "use_inter_loss is disabled (no inter criterion), matching "
                "the reference where its construction is commented out "
                "(train.py:1728-1734)")
        self.lambda_aux = config.get("lambda_aux", 1.0)
        self.lambda_adv = config.get("lambda_adv", 1.0)
        self.lambda_feat_match = config.get("lambda_feat_match", 1.0)
        self.lambda_ph = config.get("lambda_ph", 1.0)
        out_ch = config.get("generator_params", {}).get("out_channels", 1)
        self.multiband = out_ch > 1 and config.get("pqmf", False)
        if self.multiband:
            self.pqmf = PQMF(subbands=out_ch, **config.get("pqmf_params", {}))

    def mel_loss(self, y_: Array, y: Array) -> Array:
        if self.mel_is_l1:
            return jnp.mean(jnp.abs(y_ - y))
        return self.mel(_squeeze_c(y_), _squeeze_c(y))


def _squeeze_c(y: Array) -> Array:
    """(B, T, 1) -> (B, T); keep multichannel as-is for subband flatten."""
    if y.ndim == 3 and y.shape[-1] == 1:
        return y[..., 0]
    return y


def make_forward(model) -> Callable:
    """Uniform generator invocation over the zoo's differing signatures."""
    takes_train = _accepts(model, "train")
    takes_det = _accepts(model, "deterministic")
    cls = type(model).__name__

    def forward(variables, x: tuple, *, spk_id=None, ar=None, ph=None,
                rngs=None, train=False, mutable=False):
        kwargs = {}
        if takes_train:
            kwargs["train"] = train
        if takes_det:
            kwargs["deterministic"] = not train
        call_kwargs = dict(rngs=rngs)
        if mutable:
            call_kwargs["mutable"] = ["batch_stats"]
        if cls == "ParallelWaveGANGenerator":
            # x = (noise, aux) from the legacy collater
            return model.apply(variables, *x, **kwargs, **call_kwargs)
        if cls == "StyleMelGANGenerator":
            return model.apply(variables, *x, **call_kwargs)
        if cls in ("MelGANGenerator",):
            return model.apply(variables, *x, **call_kwargs)
        # HiFiGAN / GBlock / BiGRU / Transformer style
        return model.apply(variables, *x, spk_id=spk_id, ar=ar, ph=ph,
                           **kwargs, **call_kwargs)

    return forward


def _ph_cross_entropy(logits_btc: Array, targets_bt: Array) -> Array:
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits_btc, targets_bt))


def _masked_update(mask: Array, new_tree, old_tree):
    return jax.tree.map(lambda n, o: jnp.where(mask, n, o), new_tree, old_tree)


def _check_fuse_disc(config: dict) -> bool:
    """Gate ``fuse_disc_passes`` to window-free discriminators.

    A random-window discriminator (StyleMelGAN) draws FRESH windows for the
    real and fake passes in the reference (style_melgan.py:333); the fused
    [real; fake] forward necessarily scores both over the SAME windows,
    silently changing training semantics — refuse instead of relying on a
    comment (advisor round 3).
    """
    fuse = bool(config.get("fuse_disc_passes", False))
    if fuse and "StyleMelGAN" in str(config.get("discriminator_type", "")):
        raise ValueError(
            "fuse_disc_passes=true is incompatible with random-window "
            "discriminators (StyleMelGANDiscriminator draws fresh windows "
            "per pass; the fused pass would share one window RNG across "
            "real and fake). Disable fuse_disc_passes for this config.")
    return fuse


def make_train_step(gen, disc, criterion: GANCriterion, config: dict,
                    tx_g: optax.GradientTransformation,
                    tx_d: optax.GradientTransformation,
                    gen2=None) -> Callable:
    gen_fwd = make_forward(gen)
    gen2_fwd = make_forward(gen2) if gen2 is not None else None
    gen_start = int(config.get("generator_train_start_steps", 0))
    disc_start = int(config.get("discriminator_train_start_steps", 0))
    use_ar = config.get("generator_params", {}).get("use_ar", False)
    has_gen2 = gen2 is not None
    batch_max_steps = int(config.get("batch_max_steps", 0))

    use_remat = bool(config.get("use_remat", False))
    # fused real/fake disc pass (one batched [real; fake] forward): measured
    # a quantified NEGATIVE on v5e at 32x8000 — 142.0 ms vs 137.7 ms
    # unfused (+3%; the concat materializes a 2Bx8512 buffer and XLA already
    # amortizes weight reads across the two calls) — so the default is OFF
    # (benchmarks/train_bench.py --fuse-disc reproduces the A/B). Note for
    # anyone enabling it: random-window discriminators (StyleMelGAN) draw
    # FRESH windows per call in the reference (style_melgan.py:333); the
    # fused pass scores real and fake over the SAME windows.
    fuse_disc = _check_fuse_disc(config)

    @jax.checkpoint
    def _remat_forward(params_g, x, spk_id, ar, ph, rng):
        """Rematerialized generator forward (config `use_remat`): activations
        are dropped after the forward and recomputed during the backward,
        trading ~1 extra generator forward for the upsampled feature maps'
        memory. Only used for mutable-free generators."""
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "noise": jax.random.fold_in(rng, 1)}
        return gen_fwd({"params": params_g}, x, spk_id=spk_id, ar=ar, ph=ph,
                       rngs=rngs, train=True)

    def generate(params_g, params_g2, mutables_g, batch, rng, train=True,
                 mutable=True):
        """Full (cascade-aware) generator forward. Returns y_, ph_, new_mutables."""
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "noise": jax.random.fold_in(rng, 1)}
        x = batch["x"]
        ar = batch.get("ar")
        ar2 = batch.get("ar2")
        spk_id = batch.get("spk_id")
        ph = batch.get("ph")
        variables = {"params": params_g, **mutables_g}
        # batch_stats must be opened whenever the model runs in train mode
        # (BatchNorm writes); the caller decides whether to keep the update
        has_mutables = bool(mutables_g)
        if use_remat and not has_mutables and train:
            out = _remat_forward(params_g, x, spk_id, ar, ph, rng)
        else:
            out = gen_fwd(variables, x, spk_id=spk_id, ar=ar, ph=ph, rngs=rngs,
                          train=train, mutable=has_mutables and train)
        new_mutables = mutables_g
        if has_mutables and train:
            out, updated = out
            if mutable:
                new_mutables = updated
        ph_ = None
        if has_gen2:
            inter_ = out
            out2 = gen2_fwd({"params": params_g2}, (inter_,), spk_id=spk_id,
                            ar=ar2, ph=ph, rngs=rngs, train=train)
            out = out2
        if criterion.use_ph_loss:
            out, ph_ = out
        return out, ph_, new_mutables

    def disc_inputs(batch, y, y_):
        """AR-context / PCD concat for discriminator inputs (train.py:334-349)."""
        if criterion.use_pcd:
            pitch = interpolate_linear(batch["pitch"], batch_max_steps)
            period = interpolate_linear(batch["periodicity"], batch_max_steps)
            return (jnp.concatenate([y, pitch, period], axis=-1),
                    jnp.concatenate([y_, pitch, period], axis=-1))
        if use_ar:
            past = batch.get("ar2")
            if past is None:
                past = batch.get("ar")
            # concat along time (reference concatenates dim=2 of (B, C, T))
            return (jnp.concatenate([past, y], axis=1),
                    jnp.concatenate([past, y_], axis=1))
        return y, y_

    def disc_apply(params_d, x, rng):
        return disc.apply({"params": params_d}, x,
                          rngs={"window": rng} if rng is not None else None)

    def train_step(state: GANTrainState, batch: dict, rng, lr_g, lr_d):
        metrics = {}
        y = batch["y"]
        if has_gen2:
            # cascade target swap (reference train.py:261-263); the reference's
            # inter loss on y_/inter is disabled there (train.py:1728-1734),
            # so the stage-1 output is not compared against the original y
            batch = dict(batch)
            y = batch["x"][0]
        rng_g, rng_d, rng_w1, rng_w2, rng_w3 = jax.random.split(rng, 5)

        # ---------------- generator update ----------------
        def gen_loss_fn(params_g):
            y_, ph_, new_mut = generate(params_g, state.params_g2,
                                        state.mutables_g, batch, rng_g)
            y_mb_ = None
            if criterion.multiband:
                y_mb_ = y_
                y_ = criterion.pqmf.synthesis(y_mb_)
            aux = 0.0
            if criterion.use_stft_loss:
                sc, mag = criterion.stft(_squeeze_c(y_), _squeeze_c(y))
                metrics_local = {"train/spectral_convergence_loss": sc,
                                 "train/log_stft_magnitude_loss": mag}
                aux = aux + sc + mag
            else:
                metrics_local = {}
            if criterion.use_subband_stft_loss:
                aux = aux * 0.5
                y_mb = criterion.pqmf.analysis(y)
                sub_sc, sub_mag = criterion.sub_stft(y_mb_, y_mb)
                aux = aux + 0.5 * (sub_sc + sub_mag)
                metrics_local["train/sub_spectral_convergence_loss"] = sub_sc
                metrics_local["train/sub_log_stft_magnitude_loss"] = sub_mag
            if criterion.use_mel_loss:
                mel_l = criterion.mel_loss(y_, y)
                aux = aux + mel_l
                metrics_local["train/mel_loss"] = mel_l
            gen_loss = aux * criterion.lambda_aux
            if criterion.use_ph_loss:
                ph_l = _ph_cross_entropy(ph_, batch["ph"])
                gen_loss = gen_loss + criterion.lambda_ph * ph_l
                metrics_local["train/ph_loss"] = ph_l
            # adversarial part, weighted zero until the disc phase starts
            disc_y, disc_y_ = disc_inputs(batch, y, y_)
            p_ = disc_apply(state.params_d, disc_y_, rng_w1)
            adv = criterion.gen_adv(p_)
            metrics_local["train/adversarial_loss"] = adv
            if criterion.use_feat_match_loss:
                # NOTE: same window rng as the fake pass, so random-window
                # discriminators (StyleMelGAN) compare feature maps over the
                # SAME windows; the reference draws fresh windows per call and
                # questions its own choice (style_melgan.py:333)
                p = jax.lax.stop_gradient(
                    disc_apply(state.params_d, disc_y, rng_w1))
                fm = criterion.feat_match(p_, p)
                metrics_local["train/feature_matching_loss"] = fm
                adv = adv + criterion.lambda_feat_match * fm
            # cast via adv (always a traced array; gen_loss can be a Python
            # float when every aux loss is disabled)
            adv_on = (state.steps > disc_start).astype(adv.dtype)
            gen_loss = gen_loss + criterion.lambda_adv * adv_on * adv
            metrics_local["train/generator_loss"] = gen_loss
            return gen_loss, (metrics_local, new_mut)

        (gen_loss, (gmetrics, new_mutables_g)), grads_g = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.params_g)
        metrics.update(gmetrics)

        updates_g, new_opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        new_params_g = optax.apply_updates(
            state.params_g, jax.tree.map(lambda u: -lr_g * u, updates_g))
        gen_on = state.steps > gen_start
        params_g = _masked_update(gen_on, new_params_g, state.params_g)
        opt_g = _masked_update(gen_on, new_opt_g, state.opt_g)
        mutables_g = _masked_update(gen_on, new_mutables_g, state.mutables_g) \
            if state.mutables_g else state.mutables_g

        # ---------------- discriminator update ----------------
        # regenerate the fake with the UPDATED generator, no gradients
        y2_, _, _ = generate(params_g, state.params_g2, mutables_g, batch,
                             rng_d, mutable=False)
        if criterion.multiband:
            y2_ = criterion.pqmf.synthesis(y2_)
        y2_ = jax.lax.stop_gradient(y2_)
        disc_y, disc_y2_ = disc_inputs(batch, y, y2_)

        def disc_loss_fn(params_d):
            if fuse_disc:
                # one batched forward over [real; fake]: same FLOPs as two
                # passes, but each disc weight is streamed from HBM once per
                # layer instead of twice — a measured train-step win on TPU,
                # where the narrow-channel disc stack is bandwidth-bound.
                # Per-example conv math is batch-independent, so the loss is
                # numerically the two-pass loss.
                nb = disc_y.shape[0]
                p_all = disc_apply(
                    params_d, jnp.concatenate([disc_y, disc_y2_], axis=0),
                    rng_w2)
                p = jax.tree.map(lambda t: t[:nb], p_all)
                p_ = jax.tree.map(lambda t: t[nb:], p_all)
            else:
                p = disc_apply(params_d, disc_y, rng_w2)
                p_ = disc_apply(params_d, disc_y2_, rng_w3)
            real_l, fake_l = criterion.dis_adv(p_, p)
            return real_l + fake_l, (real_l, fake_l)

        (dis_loss, (real_l, fake_l)), grads_d = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.params_d)
        metrics["train/real_loss"] = real_l
        metrics["train/fake_loss"] = fake_l
        metrics["train/discriminator_loss"] = dis_loss

        updates_d, new_opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(
            state.params_d, jax.tree.map(lambda u: -lr_d * u, updates_d))
        disc_on = state.steps > disc_start
        params_d = _masked_update(disc_on, new_params_d, state.params_d)
        opt_d = _masked_update(disc_on, new_opt_d, state.opt_d)

        new_state = state.replace(
            params_g=params_g, params_d=params_d, opt_g=opt_g, opt_d=opt_d,
            mutables_g=mutables_g, steps=state.steps + 1)
        return new_state, metrics

    return train_step


def make_eval_step(gen, disc, criterion: GANCriterion, config: dict,
                   gen2=None) -> Callable:
    """Mirror of the loss computation without updates (train.py:470-601)."""
    gen_fwd = make_forward(gen)
    gen2_fwd = make_forward(gen2) if gen2 is not None else None
    has_gen2 = gen2 is not None
    use_ar = config.get("generator_params", {}).get("use_ar", False)
    batch_max_steps = int(config.get("batch_max_steps", 0))
    fuse_disc = _check_fuse_disc(config)

    def generate(state, batch, rng):
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "noise": jax.random.fold_in(rng, 1)}
        variables = {"params": state.params_g, **state.mutables_g}
        out = gen_fwd(variables, batch["x"], spk_id=batch.get("spk_id"),
                      ar=batch.get("ar"), ph=batch.get("ph"), rngs=rngs,
                      train=False)
        ph_ = None
        if has_gen2:
            out = gen2_fwd({"params": state.params_g2}, (out,),
                           spk_id=batch.get("spk_id"), ar=batch.get("ar2"),
                           ph=batch.get("ph"), rngs=rngs, train=False)
        if criterion.use_ph_loss:
            out, ph_ = out
        return out, ph_

    def eval_step(state: GANTrainState, batch: dict, rng):
        metrics = {}
        y = batch["y"]
        if has_gen2:
            y = batch["x"][0]
        rng_g, rng_w1, rng_w2 = jax.random.split(rng, 3)
        y_, ph_ = generate(state, batch, rng_g)
        y_mb_ = None
        if criterion.multiband:
            y_mb_ = y_
            y_ = criterion.pqmf.synthesis(y_mb_)
        aux = 0.0
        if criterion.use_stft_loss:
            sc, mag = criterion.stft(_squeeze_c(y_), _squeeze_c(y))
            metrics["eval/spectral_convergence_loss"] = sc
            metrics["eval/log_stft_magnitude_loss"] = mag
            aux = aux + sc + mag
        if criterion.use_subband_stft_loss:
            aux = aux * 0.5
            y_mb = criterion.pqmf.analysis(y)
            sub_sc, sub_mag = criterion.sub_stft(y_mb_, y_mb)
            aux = aux + 0.5 * (sub_sc + sub_mag)
            metrics["eval/sub_spectral_convergence_loss"] = sub_sc
            metrics["eval/sub_log_stft_magnitude_loss"] = sub_mag
        if criterion.use_mel_loss:
            mel_l = criterion.mel_loss(y_, y)
            metrics["eval/mel_loss"] = mel_l
            aux = aux + mel_l
        gen_loss = aux * criterion.lambda_aux
        if criterion.use_ph_loss:
            ph_l = _ph_cross_entropy(ph_, batch["ph"])
            metrics["eval/ph_loss"] = ph_l
            gen_loss = gen_loss + criterion.lambda_ph * ph_l

        if criterion.use_pcd:
            pitch = interpolate_linear(batch["pitch"], batch_max_steps)
            period = interpolate_linear(batch["periodicity"], batch_max_steps)
            disc_y = jnp.concatenate([y, pitch, period], axis=-1)
            disc_y_ = jnp.concatenate([y_, pitch, period], axis=-1)
        elif use_ar:
            past = batch.get("ar2")
            if past is None:
                past = batch.get("ar")
            disc_y = jnp.concatenate([past, y], axis=1)
            disc_y_ = jnp.concatenate([past, y_], axis=1)
        else:
            disc_y, disc_y_ = y, y_

        if fuse_disc:
            # batched real/fake pass (same rationale as train_step; eval has
            # no gradient so this is a pure bandwidth win)
            nb = disc_y.shape[0]
            p_all = disc.apply(
                {"params": state.params_d},
                jnp.concatenate([disc_y_, disc_y], axis=0),
                rngs={"window": rng_w1})
            p_ = jax.tree.map(lambda t: t[:nb], p_all)
            p = jax.tree.map(lambda t: t[nb:], p_all)
        else:
            p_ = disc.apply({"params": state.params_d}, disc_y_,
                            rngs={"window": rng_w1})
            p = disc.apply({"params": state.params_d}, disc_y,
                           rngs={"window": rng_w2})
        adv = criterion.gen_adv(p_)
        metrics["eval/adversarial_loss"] = adv
        if criterion.use_feat_match_loss:
            fm = criterion.feat_match(p_, p)
            metrics["eval/feature_matching_loss"] = fm
            adv = adv + criterion.lambda_feat_match * fm
        gen_loss = gen_loss + criterion.lambda_adv * adv
        metrics["eval/generator_loss"] = gen_loss
        real_l, fake_l = criterion.dis_adv(p_, p)
        metrics["eval/real_loss"] = real_l
        metrics["eval/fake_loss"] = fake_l
        metrics["eval/discriminator_loss"] = real_l + fake_l
        return metrics, y_

    return eval_step
