"""Multi-modality datasets + collater (e.g. mixed EMA + MRI corpora).

Parity targets: ``WavArtMultDataset`` (reference audio_mel_dataset.py:
534-666, per-modality audio resampling), ``ArtSCPMultDataset``
(scp_dataset.py:441-525, 3-column ``fid path modality`` scp), and
``SpeechCollaterMult`` (train.py:1101-1224 — per-modality hop-ratio
trimming, linear interpolation of articulatory streams onto the audio frame
grid, and a per-modality list-of-batches x with None for absent modalities).
Note: like the reference, the generator consuming the per-modality list
(``in_list`` models) is user-supplied; the data path here is complete.
"""

from __future__ import annotations

import os

import numpy as np

from articulatory_tpu.ops.audio import resample
from articulatory_tpu.utils.io import find_files, load_scp, read_hdf5


def _apply_art_transform(transform, art: np.ndarray) -> np.ndarray:
    """Apply a transform given as either a callable or the reference's raw
    ``"10*f0"`` YAML string (audio_mel_dataset.py:644-645 string-compare)."""
    if callable(transform):
        return transform(art)
    if transform == "10*f0":
        art = art.copy()
        art[:, 0] *= 10
    return art


def _interp_linear_np(x: np.ndarray, size: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on (T, C)."""
    t_in = len(x)
    pos = (np.arange(size) + 0.5) * (t_in / size) - 0.5
    pos = np.clip(pos, 0, t_in - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, t_in - 1)
    w = (pos - lo)[:, None]
    return x[lo] * (1 - w) + x[hi] * w


class WavArtMultDataset:
    """Audio+articulatory pairs pooled from several per-modality dump dirs."""

    def __init__(self, root_dirs, audio_query="*.h5",
                 audio_load_fn=lambda x: read_hdf5(x, "wave"),
                 audio_length_threshold=None, return_utt_id=False,
                 allow_cache=False, transform=None, sampling_rate=None,
                 sampling_rates=None, ignore_modalities=None,
                 data_root="data"):
        from articulatory_tpu.data.datasets import _stage_from_root

        self.mod_is: list[int] = []
        self.audio_files: list[str] = []
        self.utt_ids: list[str] = []
        self.art_files: list[str] = []
        self.audio_load_fn = audio_load_fn
        ignore = set(ignore_modalities or ())
        for mod_i, root_dir in enumerate(root_dirs):
            if mod_i in ignore:
                continue
            audio_files = sorted(find_files(root_dir, audio_query))
            if audio_length_threshold is not None:
                keep = [i for i, f in enumerate(audio_files)
                        if audio_load_fn(f).shape[0] > audio_length_threshold]
                audio_files = [audio_files[i] for i in keep]
            assert audio_files, f"Not found any audio files in {root_dir}."
            if ".npy" in audio_query:
                utt_ids = [os.path.basename(f).replace("-wave.npy", "")
                           for f in audio_files]
            else:
                utt_ids = [os.path.splitext(os.path.basename(f))[0]
                           for f in audio_files]
            feats_path = os.path.join(data_root, _stage_from_root(root_dir),
                                      "feats.scp")
            assert os.path.exists(feats_path), f"missing {feats_path}"
            fid_to_artp = load_scp(feats_path)
            self.audio_files += audio_files
            self.utt_ids += utt_ids
            self.art_files += [fid_to_artp[fid] for fid in utt_ids]
            self.mod_is += [mod_i] * len(audio_files)

        self.transform = transform or ""
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        self.caches: dict[int, tuple] = {}
        self.sampling_rate = sampling_rate
        self.sampling_rates = sampling_rates

    def __getitem__(self, idx: int):
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        utt_id = self.utt_ids[idx]
        audio = self.audio_load_fn(self.audio_files[idx])
        modality_i = self.mod_is[idx]
        audio = resample(audio, self.sampling_rates[modality_i],
                         self.sampling_rate)
        art = np.load(self.art_files[idx])
        art = _apply_art_transform(self.transform, art)
        items = ((utt_id, audio, art, modality_i) if self.return_utt_id
                 else (audio, art, modality_i))
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.audio_files)


class ArtSCPMultDataset:
    """3-column scp dataset: ``fid path modality``."""

    def __init__(self, feats_scp, mel_length_threshold=None,
                 return_utt_id=False, allow_cache=False, transform=None):
        self.utt_ids = []
        self.input_paths = []
        self.modalities = []
        with open(feats_scp) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                self.utt_ids.append(parts[0])
                self.input_paths.append(parts[1])
                self.modalities.append(int(parts[2]))
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        self.transform = transform or ""
        self.caches: dict[int, tuple] = {}

    def __getitem__(self, idx: int):
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        art = np.load(self.input_paths[idx])
        art = _apply_art_transform(self.transform, art)
        items = ((self.utt_ids[idx], art, self.modalities[idx])
                 if self.return_utt_id else (art, self.modalities[idx]))
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.utt_ids)


class SpeechCollaterMult:
    """Multi-modality crop collater.

    Returns a dict with ``x = ([per-modality art batch or None, ...],)``,
    ``y`` = waveform crops, and optional ``ar`` waveform context.
    """

    def __init__(self, batch_max_steps=20480, hop_size=256,
                 aux_context_window=0, use_noise_input=False, ar_len=None,
                 random_window=True, dataset_mode="a2w", hop_sizes=None,
                 sampling_rate=None, sampling_rates=None,
                 rng: np.random.Generator | None = None):
        assert batch_max_steps % hop_size == 0
        assert random_window, "only random_window is supported (as in reference)"
        self.batch_max_steps = batch_max_steps
        self.batch_max_frames = batch_max_steps // hop_size
        self.hop_size = hop_size
        self.aux_context_window = aux_context_window
        self.ar_len = ar_len
        self.dataset_mode = dataset_mode
        self.hop_sizes = hop_sizes
        self.sampling_rate = sampling_rate
        self.sampling_rates = sampling_rates
        self.rem_art_coefs = [sr / sampling_rate / h
                              for h, sr in zip(hop_sizes, sampling_rates)]
        self.rng = rng or np.random.default_rng()
        self.start_offset = aux_context_window
        self.end_offset = -(self.batch_max_frames + aux_context_window)

    def __call__(self, batch) -> dict:
        audios: list[list[np.ndarray]] = [[] for _ in self.hop_sizes]
        arts: list[list[np.ndarray]] = [[] for _ in self.hop_sizes]
        for audio, art, modality_i in batch:
            rem_audio = len(audio) % self.hop_size
            if rem_audio > 0:
                audio = audio[:-rem_audio]
                rem_art = round(rem_audio * self.rem_art_coefs[modality_i])
                if rem_art > 0:
                    art = art[:-rem_art]
            new_seq_len = len(audio) // self.hop_size
            art = _interp_linear_np(art.astype(np.float32), new_seq_len)
            audios[modality_i].append(audio)
            arts[modality_i].append(art)

        flat_audios = [a for group in audios for a in group]
        art_lengths = [len(a) for group in arts for a in group]
        start_frames = np.array([
            self.rng.integers(self.start_offset, al + self.end_offset)
            for al in art_lengths])
        y_starts = start_frames * self.hop_size
        y_ends = y_starts + self.batch_max_steps
        y_batch = np.stack([y[s:e] for y, s, e in
                            zip(flat_audios, y_starts, y_ends)]
                           ).astype(np.float32)[..., None]

        art_starts = start_frames - self.aux_context_window
        art_ends = start_frames + self.batch_max_frames + self.aux_context_window
        x_batch = []
        i = 0
        for group in arts:
            if not group:
                x_batch.append(None)
                continue
            crops = []
            for art in group:
                crops.append(art[art_starts[i]:art_ends[i]])
                i += 1
            x_batch.append(np.stack(crops).astype(np.float32))

        out = {"x": (x_batch,), "y": y_batch}
        if self.ar_len is not None:
            windows = []
            for x, start in zip(flat_audios, y_starts):
                if start >= self.ar_len:
                    w = x[start - self.ar_len: start]
                else:
                    w = np.pad(x[:start], (self.ar_len - start, 0))
                windows.append(w)
            out["ar"] = np.stack(windows).astype(np.float32)[..., None]
        return out
