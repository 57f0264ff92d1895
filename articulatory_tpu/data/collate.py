"""Collaters: turn lists of variable-length utterances into fixed-shape
numpy batches (NLC layout) ready for device transfer.

Parity target: reference bin/train.py:780-1320. All three package modes are
supported: ``window`` (concat-then-reshape into fixed windows),
``random_window`` (random fixed-size crop — the XLA-friendly default: every
batch has identical static shapes), and ``pad`` (pad-to-longest).

AR context windows ('ar' = feature-domain past, 'ar2' = waveform-domain
past) reproduce train.py:1070-1097 including zero-padding at sequence start.

Layout note: the reference emits (B, C, T); we emit (B, T, C) and audio as
(B, T, 1).
"""

from __future__ import annotations

import logging

import numpy as np


def combine_fixed_length(arrays: list[np.ndarray], length: int) -> np.ndarray:
    """Concatenate along time and reshape to (n, length, feat...) windows,
    zero-padding the tail (reference train.py:49-67)."""
    total = sum(a.shape[0] for a in arrays)
    if total % length != 0:
        pad = length - (total % length)
        arrays = list(arrays) + [
            np.zeros((pad,) + arrays[0].shape[1:], dtype=np.float32)]
        total += pad
    cat = np.concatenate([a.astype(np.float32) for a in arrays], axis=0)
    n = total // length
    return cat.reshape((n, length) + cat.shape[1:])


def _as_2d(a: np.ndarray) -> np.ndarray:
    return a[:, None] if a.ndim == 1 else a


def parse_dataset_mode(dataset_mode: str) -> tuple[str, str, bool, bool, bool]:
    """Resolve ``dataset_mode`` -> (x_key, y_key, use_audio, use_mel, use_art).

    Reference semantics (train.py:940-963): the named modes map explicitly;
    anything else takes the generic ``split('2')`` branch with
    use_audio/use_art True. The generic branch's raw keys are NOT keys the
    collater's batch dict contains — the reference would KeyError at
    ``batch[self.x_key]`` (train.py:1069-1070) on e.g. the shipped mri mode
    ``tracks_npy_minc_punc2wav_adobe_0p9_punc`` (mri2w_hifigan_car.yaml:27,
    whose own comment says "art or default"). We instead resolve unknown
    generic names onto the streams the branch actually loads: x -> 'art',
    y -> 'audio' (the articulatory-to-wave intent of every such mode), with
    a warning, so the shipped mri config trains and decodes verbatim.
    """
    named = {
        "a2w": ("art", "audio", True, False, True),
        "w2a": ("audio", "art", True, False, True),
        "ph2a": ("ph", "art", False, False, True),
        "ph2m": ("ph", "mel", False, True, False),
        "m2w": ("mel", "audio", True, True, False),
        # 'default' = config omitted the key (train.py); the articulatory
        # default is a2w. The reference IndexErrors here (train.py:958
        # xy[1] on a 1-element split) — resolving is strictly better.
        "default": ("art", "audio", True, False, True),
    }
    if dataset_mode in named:
        return named[dataset_mode]
    if dataset_mode in ("a2w_mult", "a2w_pcd"):
        # decode-only mode names (reference decode.py:229,254). Training
        # them through SpeechCollater is unsupported in the reference too
        # (KeyError on the split('2') keys, train.py:1069); refusing beats
        # silently training plain a2w semantics. PCD *training* is the
        # top-level `use_pcd: true` config key with dataset_mode a2w
        # (reference train.py:115,334); multimodal training is not wired in
        # the reference trainer (SpeechCollaterMult is decode-side only).
        raise ValueError(
            f"dataset_mode {dataset_mode!r} is decode-only; train with "
            f"dataset_mode 'a2w'"
            + (" and use_pcd: true" if dataset_mode == "a2w_pcd" else "")
            + " instead")
    xy = dataset_mode.split("2")
    if len(xy) < 2:
        logging.warning(
            f"dataset_mode {dataset_mode!r} has no '2' separator; resolving "
            f"to a2w semantics (the reference raises IndexError here, "
            f"train.py:958)")
        return named["a2w"]
    x_key, y_key = xy[0], xy[1]
    produced = {"art", "audio"}  # generic branch: use_audio=True, use_art=True
    if x_key not in produced:
        logging.warning(
            f"dataset_mode {dataset_mode!r}: input stream {x_key!r} is not a "
            f"collater key; resolving to 'art' (the reference raises KeyError "
            f"here, train.py:1069)")
        x_key = "art"
    if y_key not in produced:
        logging.warning(
            f"dataset_mode {dataset_mode!r}: output stream {y_key!r} is not a "
            f"collater key; resolving to 'audio' (the reference raises "
            f"KeyError here, train.py:1070)")
        y_key = "audio"
    return x_key, y_key, True, False, True


def is_wave_output_mode(dataset_mode: str) -> bool:
    """True when decoding this mode produces waveform output (write .wav).

    Named wave modes plus every generic x2y mode (whose y resolves to
    'audio' — see parse_dataset_mode)."""
    if dataset_mode in ("default", "a2w", "a2w_pcd", "a2w_mult", "m2w"):
        return True
    named_non_wave = ("w2a", "ph2a", "ph2m", "a2m", "m2a", "art")
    return dataset_mode not in named_non_wave and "2" in dataset_mode


class SpeechCollater:
    """Main training collater (dataset_mode 'a2w'/'w2a'/'ph2a'/'ph2m'/'m2w'/x2y)."""

    def __init__(self, batch_max_steps: int = 20480, hop_size: int = 256,
                 aux_context_window: int = 0, use_noise_input: bool = False,
                 dataset_mode: str = "a2w", use_spk_id: bool = False,
                 use_ph: bool = False, config: dict | None = None,
                 rng: np.random.Generator | None = None):
        assert batch_max_steps % hop_size == 0
        self.batch_max_steps = batch_max_steps
        self.batch_max_frames = batch_max_steps // hop_size
        self.hop_size = hop_size
        self.aux_context_window = aux_context_window
        self.use_noise_input = use_noise_input
        self.dataset_mode = dataset_mode
        self.rng = rng or np.random.default_rng()
        config = config or {}
        gp = config.get("generator_params", {})
        (self.x_key, self.y_key, self.use_audio, self.use_mel,
         self.use_art) = parse_dataset_mode(dataset_mode)
        self.use_ar = gp.get("use_ar", False)
        if self.use_ar:
            self.ar_len = int(gp.get("ar_input", 512) / gp.get("out_channels", 1))
            self.ar2_len = None
            if "generator2_params" in config:
                g2 = config["generator2_params"]
                self.ar2_len = int(g2.get("ar_input", 512) / g2.get("out_channels", 1))
            elif self.y_key == "audio":
                # waveform-output modes carry waveform-domain AR ('ar2').
                # Generalizes the reference's ("a2w", "m2w") check
                # (train.py:903-905) to generic x2y modes, whose y resolves
                # to audio (the reference crashes on those before reaching
                # its AR branch — see parse_dataset_mode)
                self.ar2_len = self.ar_len
                self.ar_len = None
        else:
            self.ar_len = None
            self.ar2_len = None
        self.package_mode = config.get("package_mode", "random_window")
        if self.package_mode == "pad":
            self.pad_audio = config.get("pad_audio", 0.0)
            self.pad_art = config.get("pad_art", 0.0)
            self.pad_ph = config.get("pad_ph", 0)
        self.use_spk_id = use_spk_id
        self.use_ph = use_ph
        self.has_generator2 = "generator2_type" in config

        self.start_offset = aux_context_window
        self.end_offset = -(self.batch_max_frames + aux_context_window)
        self.audio_seq_len = batch_max_steps
        self.art_seq_len = self.batch_max_frames

    def __call__(self, batch: list[dict]) -> dict:
        audios, arts, spk_ids, phs, mels = [], [], [], [], []
        for d in batch:
            audio = d["audio"]
            art = d["art"][: int(len(d["audio"]) / self.hop_size)]
            if len(art) + self.end_offset > self.start_offset:
                audios.append(audio)
                arts.append(art)
                if self.use_spk_id:
                    spk_ids.append(d["spk_id"])
                if self.use_ph:
                    phs.append(d["ph"])
                if self.use_mel:
                    mels.append(d["mel"])
        if len(arts) < len(batch):
            # NOTE: dropping short utterances changes the batch size, which
            # forces an XLA recompile; prefer remove_short_samples (dataset
            # level filtering) on TPU
            logging.warning(
                f"collater dropped {len(batch) - len(arts)} utterances shorter "
                f"than the {self.batch_max_frames}-frame window; enable "
                f"remove_short_samples to avoid per-batch shape changes")
        out: dict = {}
        if self.use_spk_id:
            out["spk_id"] = np.asarray(spk_ids, dtype=np.int32)

        art_starts = wav_starts = None
        if self.package_mode == "window":
            audios = [a[: len(arts[i]) * self.hop_size].astype(np.float32)
                      for i, a in enumerate(audios)]
            audio_batch = combine_fixed_length(
                [_as_2d(a) for a in audios], self.audio_seq_len)
            art_batch = combine_fixed_length(
                [a.astype(np.float32) for a in arts], self.art_seq_len)
            if self.ar_len is not None:
                raise NotImplementedError(
                    "AR windows are not supported in 'window' package mode "
                    "(matches the reference, train.py:1006-1008)")
            if self.use_ph:
                out["ph"] = combine_fixed_length(
                    [p.astype(np.float32) for p in phs],
                    self.art_seq_len).astype(np.int32)
        elif self.package_mode == "random_window":
            c_lengths = [len(c) for c in arts]
            start_frames = np.array([
                self.rng.integers(self.start_offset, cl + self.end_offset)
                for cl in c_lengths])
            wav_starts = start_frames * self.hop_size
            wav_ends = wav_starts + self.batch_max_steps
            art_starts = start_frames - self.aux_context_window
            art_ends = (start_frames + self.batch_max_frames
                        + self.aux_context_window)
            audio_batch = np.stack(
                [a[s:e] for a, s, e in zip(audios, wav_starts, wav_ends)]
            ).astype(np.float32)[..., None]  # (B, T, 1)
            art_batch = np.stack(
                [a[s:e] for a, s, e in zip(arts, art_starts, art_ends)]
            ).astype(np.float32)  # (B, T', C)
            if self.use_ph:
                out["ph"] = np.stack(
                    [p[s:e] for p, s, e in zip(phs, art_starts, art_ends)]
                ).astype(np.int32)
            if self.use_mel:
                out["mel"] = np.stack(
                    [m[s:e] for m, s, e in zip(mels, art_starts, art_ends)]
                ).astype(np.float32)
        elif self.package_mode == "pad":
            audios = [a[: len(arts[i]) * self.hop_size].astype(np.float32)
                      for i, a in enumerate(audios)]
            max_art_len = max(len(a) for a in arts)
            max_audio_len = max_art_len * self.hop_size
            audio_batch = np.stack([
                np.concatenate([a, np.full((max_audio_len - len(a),) + a.shape[1:],
                                           self.pad_audio, np.float32)])
                for a in audios])[..., None] if audios[0].ndim == 1 else None
            if audio_batch is None:
                audio_batch = np.stack([
                    np.concatenate([a, np.full((max_audio_len - len(a),) + a.shape[1:],
                                               self.pad_audio, np.float32)])
                    for a in audios])
            art_batch = np.stack([
                np.concatenate([a.astype(np.float32),
                                np.full((max_art_len - len(a),) + a.shape[1:],
                                        self.pad_art, np.float32)])
                for a in arts])
            if self.use_ph:
                phs = [p[: len(a)] for p, a in zip(phs, arts)]
                out["ph"] = np.stack([
                    np.concatenate([p.astype(np.int32),
                                    np.full((max_art_len - len(p),) + p.shape[1:],
                                            self.pad_ph, np.int32)])
                    for p in phs])
        else:
            raise ValueError(f"Unknown package_mode: {self.package_mode}")

        if self.use_audio:
            out["audio"] = audio_batch
        if self.use_art:
            out["art"] = art_batch
        out["x"] = (out[self.x_key],)
        out["y"] = out[self.y_key]

        if self.use_ar:
            ar_batch = ar2_batch = None
            if self.ar_len is not None:
                windows = []
                for art, start in zip(arts, art_starts):
                    if start >= self.ar_len:
                        w = art[start - self.ar_len: start]
                    else:
                        w = art[:start]
                        w = np.pad(w, ((self.ar_len - len(w), 0), (0, 0)))
                    windows.append(w)
                ar_batch = np.stack(windows).astype(np.float32)  # (B, T_ar, C)
            if self.ar2_len is not None:
                windows = []
                for wav, start in zip(audios, wav_starts):
                    if start >= self.ar2_len:
                        w = wav[start - self.ar2_len: start]
                    else:
                        w = wav[:start]
                        w = np.pad(w, (self.ar2_len - len(w), 0))
                    windows.append(w)
                ar2_batch = np.stack(windows).astype(np.float32)[..., None]  # (B, T_ar, 1)
            if self.has_generator2:
                out["ar"] = ar_batch
                out["ar2"] = ar2_batch
            else:
                out["ar"] = ar2_batch if self.ar_len is None else ar_batch
        return out


class CollaterMelArt:
    """Random-window crop for (mel, art) pairs, a2m/m2a (train.py:780-862)."""

    def __init__(self, batch_max_steps: int = 20480, hop_size: int = 256,
                 aux_context_window: int = 2, use_noise_input: bool = False,
                 ar_len=None, dataset_mode: str = "a2m",
                 rng: np.random.Generator | None = None):
        if batch_max_steps % hop_size != 0:
            batch_max_steps += -(batch_max_steps % hop_size)
        self.batch_max_steps = batch_max_steps
        self.batch_max_frames = batch_max_steps // hop_size
        self.hop_size = hop_size
        self.aux_context_window = aux_context_window
        self.ar_len = ar_len
        self.dataset_mode = dataset_mode
        self.rng = rng or np.random.default_rng()
        self.start_offset = aux_context_window
        self.end_offset = -(self.batch_max_frames + aux_context_window)

    def __call__(self, batch) -> dict:
        if self.ar_len is not None:
            raise NotImplementedError("ar not supported (matches reference)")
        cs = [b[0] for b in batch]
        arts = [b[1] for b in batch]
        c_lengths = [len(c) for c in cs]
        start_frames = np.array([
            self.rng.integers(self.start_offset, cl + self.end_offset)
            for cl in c_lengths])
        c_starts = start_frames - self.aux_context_window
        c_ends = start_frames + self.batch_max_frames + self.aux_context_window
        c_batch = np.stack(
            [c[s:e] for c, s, e in zip(cs, c_starts, c_ends)]).astype(np.float32)
        art_batch = np.stack(
            [a[s:e] for a, s, e in zip(arts, c_starts, c_ends)]).astype(np.float32)
        if self.dataset_mode == "m2a":
            return {"x": (c_batch,), "y": art_batch}
        return {"x": (art_batch,), "y": c_batch}


class Collater:
    """Legacy ParallelWaveGAN wav+mel collater (train.py:1227-1320):
    random crop with aux context window; optionally adds a noise input."""

    def __init__(self, batch_max_steps: int = 20480, hop_size: int = 256,
                 aux_context_window: int = 2, use_noise_input: bool = False,
                 rng: np.random.Generator | None = None):
        if batch_max_steps % hop_size != 0:
            batch_max_steps += -(batch_max_steps % hop_size)
        assert batch_max_steps % hop_size == 0
        self.batch_max_steps = batch_max_steps
        self.batch_max_frames = batch_max_steps // hop_size
        self.hop_size = hop_size
        self.aux_context_window = aux_context_window
        self.use_noise_input = use_noise_input
        self.rng = rng or np.random.default_rng()
        self.start_offset = aux_context_window
        self.end_offset = -(self.batch_max_frames + aux_context_window)
        self.mel_threshold = self.batch_max_frames + 2 * aux_context_window

    def __call__(self, batch) -> dict:
        batch = [b for b in batch if len(b[1]) > self.mel_threshold]
        xs = [b[0] for b in batch]
        cs = [b[1] for b in batch]
        c_lengths = [len(c) for c in cs]
        start_frames = np.array([
            self.rng.integers(self.start_offset, cl + self.end_offset)
            for cl in c_lengths])
        x_starts = start_frames * self.hop_size
        x_ends = x_starts + self.batch_max_steps
        c_starts = start_frames - self.aux_context_window
        c_ends = start_frames + self.batch_max_frames + self.aux_context_window
        y_batch = np.stack(
            [x[s:e] for x, s, e in zip(xs, x_starts, x_ends)]
        ).astype(np.float32)[..., None]  # (B, T, 1)
        c_batch = np.stack(
            [c[s:e] for c, s, e in zip(cs, c_starts, c_ends)]).astype(np.float32)
        out: dict = {"y": y_batch}
        if self.use_noise_input:
            z_batch = self.rng.standard_normal(y_batch.shape).astype(np.float32)
            out["x"] = (z_batch, c_batch)
        else:
            out["x"] = (c_batch,)
        return out
