"""Datasets over dumped features (hdf5/npy) and kaldi-style scp maps.

Parity targets: reference articulatory/datasets/audio_mel_dataset.py and
scp_dataset.py. All datasets return numpy arrays; batching/device transfer
happens in the loader. The reference hard-wires the articulatory feats path
as ``data/<stage>/feats.scp`` where ``<stage>`` is the second component of
``root_dir`` (audio_mel_dataset.py:391-393); ``data_root`` makes that
convention configurable without breaking it.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Sequence

import numpy as np

from articulatory_tpu.utils.io import (
    HDF5ScpLoader,
    NpyScpLoader,
    WavScpLoader,
    find_files,
    load_scp,
    read_hdf5,
)


def _stage_from_root(root_dir: str) -> str:
    """Derive the data-stage name from a dump dir path.

    The reference hard-codes ``root_dir.split('/')[1]`` for paths like
    ``dump/<set>/norm`` (audio_mel_dataset.py:391-393). Generalized: the
    component after a 'dump' directory, else the 2nd component of a relative
    path, else the basename.
    """
    parts = [p for p in os.path.normpath(root_dir).split(os.sep) if p]
    if "dump" in parts:
        i = parts.index("dump")
        if i + 1 < len(parts):
            return parts[i + 1]
    if not os.path.isabs(root_dir) and len(parts) > 1:
        return parts[1]
    return parts[-1]


def _default_audio_load(path: str) -> np.ndarray:
    return read_hdf5(path, "wave")


def _default_feats_load(path: str) -> np.ndarray:
    return read_hdf5(path, "feats")


class SpeechDataset:
    """Audio (dumped .h5 'wave') + articulatory features (.npy via feats.scp)."""

    def __init__(self, root_dir: str, audio_query: str = "*.h5",
                 mel_query: str = "*.h5",
                 audio_load_fn: Callable = _default_audio_load,
                 mel_load_fn: Callable = _default_feats_load,
                 audio_length_threshold: int | None = None,
                 mel_length_threshold: int | None = None,
                 return_utt_id: bool = False, allow_cache: bool = False,
                 transform=None, input_transform=None, output_transform=None,
                 spks: Sequence[str] | None = None, use_spk_id: bool = False,
                 use_ph: bool = False, dataset_mode: str | None = None,
                 data_root: str = "data"):
        audio_files = sorted(find_files(root_dir, audio_query))
        mel_files = sorted(find_files(root_dir, mel_query))

        if audio_length_threshold is not None:
            lengths = [audio_load_fn(f).shape[0] for f in audio_files]
            idxs = [i for i in range(len(audio_files))
                    if lengths[i] > audio_length_threshold]
            if len(idxs) != len(audio_files):
                logging.warning(f"Some files are filtered by audio length threshold "
                                f"({len(audio_files)} -> {len(idxs)}).")
            audio_files = [audio_files[i] for i in idxs]
            mel_files = [mel_files[i] for i in idxs]
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            idxs = [i for i in range(len(mel_files))
                    if lengths[i] > mel_length_threshold]
            if len(idxs) != len(mel_files):
                logging.warning(f"Some files are filtered by mel length threshold "
                                f"({len(mel_files)} -> {len(idxs)}).")
            audio_files = [audio_files[i] for i in idxs]
            mel_files = [mel_files[i] for i in idxs]

        assert len(audio_files) != 0, f"Not found any audio files in {root_dir}."
        assert len(audio_files) == len(mel_files)

        self.audio_files = audio_files
        self.mel_files = mel_files
        self.audio_load_fn = audio_load_fn
        self.mel_load_fn = mel_load_fn
        if ".npy" in audio_query:
            self.utt_ids = [os.path.basename(f).replace("-wave.npy", "")
                            for f in audio_files]
        else:
            self.utt_ids = [os.path.splitext(os.path.basename(f))[0]
                            for f in audio_files]

        stage = _stage_from_root(root_dir)
        feats_path = os.path.join(data_root, stage, "feats.scp")
        assert os.path.exists(feats_path), f"missing {feats_path}"
        fid_to_artp = load_scp(feats_path)
        self.art_files = [fid_to_artp[fid] for fid in self.utt_ids]

        # speaker maps
        spk2utt = None
        utt2spk = None
        spk2utt_path = os.path.join(data_root, stage, "spk2utt")
        utt2spk_path = os.path.join(data_root, stage, "utt2spk")
        if os.path.exists(spk2utt_path):
            spk2utt = {}
            with open(spk2utt_path) as f:
                for line in f:
                    ls = line.split()
                    if ls:
                        spk2utt[ls[0]] = ls[1:]
        if os.path.exists(utt2spk_path):
            utt2spk = dict(load_scp(utt2spk_path).items())
        if spk2utt is None and utt2spk is not None:
            spk2utt = {}
            for utt, spk in utt2spk.items():
                spk2utt.setdefault(spk, []).append(utt)
        if utt2spk is None and spk2utt is not None:
            utt2spk = {u: s for s, us in spk2utt.items() for u in us}
        if spks is None and spk2utt is not None:
            spks = sorted(spk2utt.keys())
        self.spks = spks
        self.spk2id = ({s: i for i, s in enumerate(spks)} if spks is not None else None)
        self.spk2utt = spk2utt
        self.utt2spk = utt2spk
        self.use_spk_id = use_spk_id
        if use_spk_id:
            assert utt2spk is not None and self.spk2id is not None

        self.use_ph = use_ph
        if use_ph:
            ph_path = os.path.join(data_root, stage, "ph.scp")
            assert os.path.exists(ph_path)
            fid_to_php = load_scp(ph_path)
            self.ph_files = [fid_to_php[fid] for fid in self.utt_ids]

        self.input_transform = input_transform if input_transform is not None else transform
        # No None -> ``transform`` fallback here (deliberate divergence from
        # reference audio_mel_dataset.py:465): bin/train.py owns the
        # defaulting and keeps art-only transforms (e.g. "10*f0") off the
        # 1-D audio output — the reference would crash on that config.
        self.output_transform = output_transform
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        self.caches: dict[int, dict] = {}
        self.use_audio = True
        self.use_mel = dataset_mode in ("ph2m", "m2w")

    def __getitem__(self, idx: int) -> dict:
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        utt_id = self.utt_ids[idx]
        art = np.load(self.art_files[idx])  # (T', C)
        if self.input_transform is not None:
            art = self.input_transform(art)
        items = {"art": art}
        if self.use_audio:
            audio = self.audio_load_fn(self.audio_files[idx])
            if self.output_transform is not None:
                audio = self.output_transform(audio)
            items["audio"] = audio
        if self.use_mel:
            mel = self.mel_load_fn(self.mel_files[idx])
            items["mel"] = mel[: len(art), :]
        if self.return_utt_id:
            items["utt_id"] = utt_id
        if self.use_spk_id:
            items["spk_id"] = self.spk2id[self.utt2spk[utt_id]]
        if self.use_ph:
            items["ph"] = np.load(self.ph_files[idx])
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.audio_files)


class MelArtDataset:
    """(mel, art) pairs for a2m / m2a training (reference :150-302)."""

    def __init__(self, root_dir: str, mel_query: str = "*.h5",
                 mel_load_fn: Callable = _default_feats_load,
                 mel_length_threshold: int | None = None,
                 return_utt_id: bool = False, allow_cache: bool = False,
                 transform=None, dataset_mode: str = "a2m",
                 data_root: str = "data"):
        mel_files = sorted(find_files(root_dir, mel_query))
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            idxs = [i for i in range(len(mel_files))
                    if lengths[i] > mel_length_threshold]
            mel_files = [mel_files[i] for i in idxs]
        assert len(mel_files) != 0, f"Not found any mel files in {root_dir}."
        self.mel_files = mel_files
        self.mel_load_fn = mel_load_fn
        self.utt_ids = [os.path.splitext(os.path.basename(f))[0] for f in mel_files]
        stage = _stage_from_root(root_dir)
        feats_path = os.path.join(data_root, stage, "feats.scp")
        assert os.path.exists(feats_path)
        fid_to_artp = load_scp(feats_path)
        self.art_files = [fid_to_artp[fid] for fid in self.utt_ids]
        self.transform = transform
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        self.caches: dict[int, tuple] = {}

    def __getitem__(self, idx: int):
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        mel = self.mel_load_fn(self.mel_files[idx])
        art = np.load(self.art_files[idx])
        if self.transform is not None:
            art = self.transform(art)
        mel = mel[: len(art), :]
        art = art[: len(mel), :]
        if self.return_utt_id:
            items = (self.utt_ids[idx], mel, art)
        else:
            items = (mel, art)
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.mel_files)


class AudioDataset:
    """Single-stream audio dataset (reference :669-764)."""

    def __init__(self, root_dir: str, audio_query: str = "*-wave.npy",
                 audio_load_fn: Callable = np.load,
                 audio_length_threshold: int | None = None,
                 return_utt_id: bool = False, allow_cache: bool = False):
        audio_files = sorted(find_files(root_dir, audio_query))
        if audio_length_threshold is not None:
            lengths = [audio_load_fn(f).shape[0] for f in audio_files]
            idxs = [i for i in range(len(audio_files))
                    if lengths[i] > audio_length_threshold]
            audio_files = [audio_files[i] for i in idxs]
        assert len(audio_files) != 0, f"Not found any audio files in {root_dir}."
        self.audio_files = audio_files
        self.audio_load_fn = audio_load_fn
        if ".npy" in audio_query:
            self.utt_ids = [os.path.basename(f).replace("-wave.npy", "")
                            for f in audio_files]
        else:
            self.utt_ids = [os.path.splitext(os.path.basename(f))[0]
                            for f in audio_files]
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        self.caches: dict[int, object] = {}

    def __getitem__(self, idx: int):
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        audio = self.audio_load_fn(self.audio_files[idx])
        items = (self.utt_ids[idx], audio) if self.return_utt_id else audio
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.audio_files)


class MelDataset:
    """Single-stream feature dataset (reference :767-861)."""

    def __init__(self, root_dir: str, mel_query: str = "*-feats.npy",
                 mel_load_fn: Callable = np.load,
                 mel_length_threshold: int | None = None,
                 return_utt_id: bool = False, allow_cache: bool = False):
        mel_files = sorted(find_files(root_dir, mel_query))
        if mel_length_threshold is not None:
            lengths = [mel_load_fn(f).shape[0] for f in mel_files]
            idxs = [i for i in range(len(mel_files))
                    if lengths[i] > mel_length_threshold]
            mel_files = [mel_files[i] for i in idxs]
        assert len(mel_files) != 0, f"Not found any mel files in {root_dir}."
        self.mel_files = mel_files
        self.mel_load_fn = mel_load_fn
        if ".npy" in mel_query:
            self.utt_ids = [os.path.basename(f).replace("-feats.npy", "")
                            for f in mel_files]
        else:
            self.utt_ids = [os.path.splitext(os.path.basename(f))[0]
                            for f in mel_files]
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        self.caches: dict[int, object] = {}

    def __getitem__(self, idx: int):
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        mel = self.mel_load_fn(self.mel_files[idx])
        items = (self.utt_ids[idx], mel) if self.return_utt_id else mel
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.mel_files)


class ArtDataset:
    """Articulatory feature dataset driven by a feats.scp of .npy paths
    (reference :864-...)."""

    def __init__(self, feats_scp_or_dir: str, query: str = "*.npy",
                 length_threshold: int | None = None,
                 return_utt_id: bool = False, allow_cache: bool = False,
                 transform=None, load_fn=None):
        self.load_fn = load_fn if load_fn is not None else np.load
        if os.path.isdir(feats_scp_or_dir):
            files = sorted(find_files(feats_scp_or_dir, query))
            # dump convention <utt>-feats.npy (reference :914); plain
            # <utt>.<ext> otherwise
            self.utt_ids = [
                os.path.basename(f).replace("-feats.npy", "")
                if f.endswith("-feats.npy")
                else os.path.splitext(os.path.basename(f))[0]
                for f in files]
            self.art_files = files
        else:
            scp = load_scp(feats_scp_or_dir)
            self.utt_ids = list(scp.keys())
            self.art_files = list(scp.values())
        if length_threshold is not None:
            keep = [i for i, f in enumerate(self.art_files)
                    if self.load_fn(f).shape[0] > length_threshold]
            self.utt_ids = [self.utt_ids[i] for i in keep]
            self.art_files = [self.art_files[i] for i in keep]
        self.return_utt_id = return_utt_id
        self.transform = transform
        self.allow_cache = allow_cache
        self.caches: dict[int, object] = {}

    def __getitem__(self, idx: int):
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        art = self.load_fn(self.art_files[idx])
        if self.transform is not None:
            art = self.transform(art)
        items = (self.utt_ids[idx], art) if self.return_utt_id else art
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.art_files)


class AudioSCPDataset:
    """wav.scp-driven audio dataset returning (audio, fs) pairs
    (reference scp_dataset.py:49-173)."""

    def __init__(self, wav_scp: str, segments=None, audio_length_threshold=None,
                 return_utt_id: bool = False, return_sampling_rate: bool = True,
                 allow_cache: bool = False):
        self.loader = WavScpLoader(wav_scp, segments=segments)
        self.utt_ids = list(self.loader.keys())
        if audio_length_threshold is not None:
            # eager length filter (reference scp_dataset.py:83-96)
            keep = [u for u in self.utt_ids
                    if self.loader[u][0].shape[0] > audio_length_threshold]
            if len(keep) != len(self.utt_ids):
                logging.warning(
                    f"Some files are filtered by audio length threshold "
                    f"({len(self.utt_ids)} -> {len(keep)}).")
            self.utt_ids = keep
        self.return_utt_id = return_utt_id
        self.return_sampling_rate = return_sampling_rate
        self.allow_cache = allow_cache
        self.caches: dict[int, object] = {}

    def __getitem__(self, idx: int):
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        utt_id = self.utt_ids[idx]
        audio, fs = self.loader[utt_id]
        if self.return_sampling_rate:
            payload = (audio, fs)
        else:
            payload = audio
        items = (utt_id, *((payload,) if not isinstance(payload, tuple) else payload)) \
            if self.return_utt_id else payload
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.utt_ids)


class MelSCPDataset:
    """feats.scp-driven feature dataset (hdf5 or npy values)
    (reference scp_dataset.py:176-271)."""

    def __init__(self, feats_scp: str, mel_length_threshold=None,
                 return_utt_id: bool = False, allow_cache: bool = False):
        with open(feats_scp) as f:
            first = f.readline().split()
        value = first[1] if len(first) > 1 else ""
        if value.endswith(".npy"):
            self.loader = NpyScpLoader(feats_scp)
        else:
            self.loader = HDF5ScpLoader(feats_scp)
        self.utt_ids = list(self.loader.keys())
        if mel_length_threshold is not None:
            # eager length filter (reference scp_dataset.py:98-112)
            keep = [u for u in self.utt_ids
                    if self.loader[u].shape[0] > mel_length_threshold]
            if len(keep) != len(self.utt_ids):
                logging.warning(
                    f"Some files are filtered by mel length threshold "
                    f"({len(self.utt_ids)} -> {len(keep)}).")
            self.utt_ids = keep
        self.return_utt_id = return_utt_id
        self.allow_cache = allow_cache
        self.caches: dict[int, object] = {}

    def __getitem__(self, idx: int):
        if self.allow_cache and idx in self.caches:
            return self.caches[idx]
        utt_id = self.utt_ids[idx]
        mel = self.loader[utt_id]
        items = (utt_id, mel) if self.return_utt_id else mel
        if self.allow_cache:
            self.caches[idx] = items
        return items

    def __len__(self) -> int:
        return len(self.utt_ids)


# reference scp_dataset.py:274: ArtSCPDataset is the same as MelSCPDataset
# modulo naming and an optional transform
class ArtSCPDataset(MelSCPDataset):
    def __init__(self, feats_scp: str, transform=None, **kwargs):
        super().__init__(feats_scp, **kwargs)
        self.transform = transform

    def __getitem__(self, idx: int):
        items = super().__getitem__(idx)
        if self.transform is not None:
            if self.return_utt_id:
                items = (items[0], self.transform(items[1]))
            else:
                items = self.transform(items)
        return items
