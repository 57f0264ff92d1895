"""Device-resident corpus cache: random-window batch assembly ON the TPU.

Motivation (hard-learned): on the axon relay platform every host->device
transfer leaks its host staging buffer (~transfer size per call, verified
empirically — a 4.5 h full-size GAN run leaked 130 GB host RSS and was
OOM-killed at 160k steps). Architecturally the fix is also simply the more
TPU-native pipeline: pad the whole corpus into a handful of device arrays
ONCE, then assemble each training batch on device with a jitted gather +
dynamic-slice crop. Per step the host ships only the (utt, start) index
arrays — a few hundred bytes instead of ~1 MB — so host transfers stop
being a leak, a bandwidth cost, or a latency item at all.

Semantics mirror the host collaters exactly (SpeechCollater random_window,
reference train.py:1009-1097, and CollaterMelArt :780-862), including the
AR context windows zero-padded at the sequence start; equivalence is pinned
by tests/test_device_cache.py which compares against the host collater for
identical (utt, start) draws.

Supported: dataset_mode a2w / w2a (audio+art[+ar]) and a2m / m2a (mel+art).
spk_id/ph hooks and package modes other than random_window stay on the host
path.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np


def canonical_cache_mode(dataset_mode: str) -> str | None:
    """Map a dataset_mode onto the cache's canonical mode, or None.

    Generic ``x2y`` mode strings resolve onto the art/audio streams exactly
    like the training collater does (collate.parse_dataset_mode — e.g. the
    shipped mri mode ``tracks_npy_minc_punc2wav_adobe_0p9_punc`` has a2w
    semantics, mri2w_hifigan_car.yaml:27), so the device cache serves them
    through the matching canonical mode. Modes whose streams the cache does
    not hold (ph/mel-to-wave, multimodal, decode-only) return None.
    """
    if dataset_mode in ("a2w", "w2a", "a2m", "m2a"):
        return dataset_mode
    if dataset_mode in ("a2w_mult", "a2w_pcd"):
        return None
    from articulatory_tpu.data.collate import parse_dataset_mode

    try:
        x_key, y_key = parse_dataset_mode(dataset_mode)[:2]
    except ValueError:
        return None
    return {("art", "audio"): "a2w",
            ("audio", "art"): "w2a"}.get((x_key, y_key))


class DeviceCachedBatcher:
    """Iterable over jitted device-assembled random-window batches.

    Wraps a SpeechDataset/MelArtDataset-style dataset whose items contain
    "audio" + "art" (a2w/w2a) or mel + art pairs (a2m/m2a). One pass pads
    every stream into device-resident arrays; iteration then yields batches
    whose leaves are already jax Arrays.
    """

    def __init__(self, dataset, config: dict, *, batch_size: int,
                 seed: int = 0, drop_last: bool = True,
                 steps_per_epoch: int | None = None):
        mode = config.get("dataset_mode", "a2w")
        if mode not in ("a2w", "w2a", "a2m", "m2a"):
            raise ValueError(f"device cache does not support mode {mode}")
        gp = config.get("generator_params", {})
        if gp.get("use_spk_id") or gp.get("use_ph"):
            raise ValueError("device cache does not support spk/ph hooks")
        if config.get("use_pcd"):
            raise ValueError("device cache does not support PCD training: "
                             "the pitch/periodicity streams the disc input "
                             "concat needs (train/gan.py::disc_inputs) are "
                             "not cached")
        if config.get("generator2_type"):
            raise ValueError("device cache does not support two-stage "
                             "(generator2) configs: the host collater's 'ar2' "
                             "waveform windows are not reproduced here")
        if gp.get("aux_context_window", 0):
            raise ValueError("device cache does not support "
                             "aux_context_window != 0")
        self.mode = mode
        self.hop = int(config["hop_size"])
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.is_melart = mode in ("a2m", "m2a")
        if self.is_melart:
            self.frames = int(config["batch_max_steps"]) // self.hop
            self.use_ar = False
            self.ar_len = 0
        else:
            self.samples = int(config["batch_max_steps"])
            self.frames = self.samples // self.hop
            self.use_ar = gp.get("use_ar", False)
            # both directions condition on ar_input / out_channels past steps
            # (host collater semantics, collate.py:61): a2w past waveform
            # samples, w2a past feature frames
            out_ch = gp.get("out_channels", 1)
            self.ar_len = (int(gp.get("ar_input", 512) / out_ch)
                           if self.use_ar else 0)

        self._build(dataset)
        self._crop = self._make_crop()
        if steps_per_epoch is None:
            steps_per_epoch = max(1, self.n_utts // batch_size)
        self.steps_per_epoch = steps_per_epoch

    # ------------------------------------------------------------- building
    def _build(self, dataset) -> None:
        arts, audios, mels = [], [], []
        for i in range(len(dataset)):
            d = dataset[i]
            if self.is_melart:
                mel, art = (d[0], d[1]) if not isinstance(d, dict) else (
                    d["mel"], d["art"])
                t = min(len(mel), len(art))
                if t < self.frames + 1:
                    continue
                mels.append(np.asarray(mel[:t], np.float32))
                arts.append(np.asarray(art[:t], np.float32))
            else:
                audio = np.asarray(d["audio"], np.float32)
                art = np.asarray(d["art"], np.float32)
                art = art[: len(audio) // self.hop]
                if len(art) < self.frames + 1:
                    continue
                audios.append(audio[: len(art) * self.hop])
                arts.append(art)
        self.n_utts = len(arts)
        if self.n_utts == 0:
            raise ValueError("no utterance is long enough for the window")
        self.lengths = np.asarray([len(a) for a in arts], np.int32)  # frames
        fmax = int(self.lengths.max())

        def pad_stack(xs, tmax):
            out = np.zeros((len(xs), tmax) + xs[0].shape[1:], np.float32)
            for i, x in enumerate(xs):
                out[i, : len(x)] = x
            return out

        # w2a AR conditions on past *features*: left-pad the (single) art
        # array by ar_len frames and read both the art window (at offset
        # art_off) and the AR window (at offset 0) out of it — one device
        # copy, not two
        self.art_off = self.ar_len if self.mode == "w2a" else 0
        art = pad_stack(arts, fmax)
        if self.art_off:
            art = np.concatenate(
                [np.zeros((self.n_utts, self.art_off) + arts[0].shape[1:],
                          np.float32), art], axis=1)
        self.d_art = jnp.asarray(art)
        if self.is_melart:
            self.d_mel = jnp.asarray(pad_stack(mels, fmax))
            n_bytes = self.d_art.nbytes + self.d_mel.nbytes
        else:
            # left-pad audio by ar_len zeros => AR windows before the start
            # come out zero-padded exactly like the host collater
            pad = self.ar_len if self.mode == "a2w" else 0
            audio = pad_stack(audios, fmax * self.hop)
            if pad:
                audio = np.concatenate(
                    [np.zeros((len(audios), pad), np.float32), audio], axis=1)
            self.d_audio = jnp.asarray(audio)
            n_bytes = self.d_art.nbytes + self.d_audio.nbytes
        logging.info(
            f"device corpus cache: {self.n_utts} utterances, "
            f"{n_bytes / 1e6:.0f} MB resident on device")

    # ---------------------------------------------------------------- crops
    def _make_crop(self):
        hop, frames = self.hop, self.frames
        mode, ar_len = self.mode, self.ar_len

        if self.is_melart:
            d_mel, d_art = self.d_mel, self.d_art

            @jax.jit
            def crop(utts, starts):
                def one(u, s):
                    mel_w = jax.lax.dynamic_slice(
                        d_mel[u], (s, 0), (frames, d_mel.shape[2]))
                    art_w = jax.lax.dynamic_slice(
                        d_art[u], (s, 0), (frames, d_art.shape[2]))
                    return mel_w, art_w

                mel_b, art_b = jax.vmap(one)(utts, starts)
                if mode == "m2a":
                    return {"x": (mel_b,), "y": art_b}
                return {"x": (art_b,), "y": mel_b}

            return crop

        d_art, d_audio = self.d_art, self.d_audio
        samples = self.samples
        art_off = self.art_off

        @jax.jit
        def crop(utts, starts):
            def one(u, s):
                # art stream is left-padded by art_off frames for w2a
                art_w = jax.lax.dynamic_slice(
                    d_art[u], (s + art_off, 0), (frames, d_art.shape[2]))
                # audio stream is left-padded by ar_len for a2w
                a0 = s * hop + (ar_len if mode == "a2w" else 0)
                audio_w = jax.lax.dynamic_slice(d_audio[u], (a0,), (samples,))
                out = {"art": art_w, "audio": audio_w[:, None]}
                if ar_len and mode == "a2w":
                    out["ar"] = jax.lax.dynamic_slice(
                        d_audio[u], (s * hop,), (ar_len,))[:, None]
                if ar_len and mode == "w2a":
                    out["ar"] = jax.lax.dynamic_slice(
                        d_art[u], (s, 0), (ar_len, d_art.shape[2]))
                return out

            b = jax.vmap(one)(utts, starts)
            out = {"x": (b["art"] if mode == "a2w" else b["audio"],),
                   "y": b["audio"] if mode == "a2w" else b["art"]}
            if "ar" in b:
                out["ar"] = b["ar"]
            return out

        return crop

    # ------------------------------------------------------------ iteration
    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.steps_per_epoch

    def sample_indices(self, rng: np.random.Generator):
        """One batch of (utt, start) draws; starts ∈ [0, len - frames - 1],
        matching the host collater's exclusive-high draw
        (collate.py: rng.integers(start_offset, cl + end_offset))."""
        utts = rng.integers(0, self.n_utts, self.batch_size)
        highs = self.lengths[utts] - self.frames  # exclusive
        starts = (rng.random(self.batch_size) * highs).astype(np.int64)
        return utts.astype(np.int32), starts.astype(np.int32)

    def batch_at(self, utts: np.ndarray, starts: np.ndarray) -> dict:
        """Assemble the batch for explicit indices (also used by tests)."""
        return self._crop(jnp.asarray(utts, jnp.int32),
                          jnp.asarray(starts, jnp.int32))

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        for _ in range(self.steps_per_epoch):
            utts, starts = self.sample_indices(rng)
            yield self.batch_at(utts, starts)
