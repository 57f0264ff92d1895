"""File I/O utilities: HDF5 datasets, kaldi-style scp maps, wav read/write.

API parity with reference articulatory/utils/utils.py (find_files:61,
read_hdf5:83, write_hdf5:110, HDF5ScpLoader:156, NpyScpLoader:240), with
soundfile replaced by a scipy-based PCM wav reader/writer (soundfile is not
available in this environment).
"""

from __future__ import annotations

import fnmatch
import logging
import os
import sys

import h5py
import numpy as np
from scipy.io import wavfile


def find_files(root_dir: str, query: str = "*.wav", include_root_dir: bool = True
               ) -> list[str]:
    """Recursively find files matching the query pattern."""
    files = []
    for root, _, filenames in os.walk(root_dir, followlinks=True):
        for filename in fnmatch.filter(filenames, query):
            files.append(os.path.join(root, filename))
    if not include_root_dir:
        files = [f.replace(root_dir + "/", "") for f in files]
    return sorted(files)


def read_hdf5(hdf5_name: str, hdf5_path: str) -> np.ndarray:
    """Read a named dataset from an hdf5 file."""
    if not os.path.exists(hdf5_name):
        logging.error(f"There is no such a hdf5 file ({hdf5_name}).")
        sys.exit(1)
    with h5py.File(hdf5_name, "r") as f:
        if hdf5_path not in f:
            logging.error(f"There is no such a data in hdf5 file. ({hdf5_path})")
            sys.exit(1)
        data = f[hdf5_path][()]
    return data


def write_hdf5(hdf5_name: str, hdf5_path: str, write_data, is_overwrite: bool = True
               ) -> None:
    """Write a dataset into an hdf5 file, creating parent dirs as needed."""
    write_data = np.asarray(write_data)
    folder = os.path.dirname(hdf5_name)
    if folder and not os.path.exists(folder):
        os.makedirs(folder, exist_ok=True)
    with h5py.File(hdf5_name, "a") as f:
        if hdf5_path in f:
            if is_overwrite:
                del f[hdf5_path]
            else:
                logging.error("Dataset in hdf5 file already exists. "
                              "if you want to overwrite, please set is_overwrite = True.")
                sys.exit(1)
        f.create_dataset(hdf5_path, data=write_data)


def _pcm_to_float(data: np.ndarray) -> np.ndarray:
    """Integer PCM -> float32 in [-1, 1] (passthrough for float data)."""
    if data.dtype == np.int16:
        return data.astype(np.float32) / 32768.0
    if data.dtype == np.int32:
        return data.astype(np.float32) / 2147483648.0
    if data.dtype == np.uint8:
        return (data.astype(np.float32) - 128.0) / 128.0
    return data.astype(np.float32)


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a wav file -> (float32 waveform in [-1, 1], sample rate)."""
    sr, data = wavfile.read(path)
    return _pcm_to_float(data), int(sr)


def write_wav(path: str, wav: np.ndarray, sr: int, subtype: str = "PCM_16") -> None:
    """Write a float waveform as PCM_16 (default, matching reference decode)."""
    folder = os.path.dirname(path)
    if folder:
        os.makedirs(folder, exist_ok=True)
    wav = np.asarray(wav, dtype=np.float64)
    if subtype == "PCM_16":
        data = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    elif subtype == "FLOAT":
        data = wav.astype(np.float32)
    else:
        raise ValueError(f"Unsupported subtype: {subtype}")
    wavfile.write(path, sr, data)


def load_scp(path: str) -> dict[str, str]:
    """Parse a kaldi-style 'utt_id value' scp file into an ordered dict."""
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key, value = line.split(maxsplit=1)
            out[key] = value
    return out


class HDF5ScpLoader:
    """Lazy loader for scp files whose values point at hdf5 datasets.

    Supports both 'key some.h5:feats' and 'key some.h5' (uses default_hdf5_path).
    """

    def __init__(self, feats_scp: str, default_hdf5_path: str = "feats"):
        self.default_hdf5_path = default_hdf5_path
        self.data = load_scp(feats_scp)

    def get_path(self, key: str) -> str:
        return self.data[key]

    def __getitem__(self, key: str) -> np.ndarray:
        p = self.data[key]
        if ":" in p:
            path, dset = p.split(":", 1)
            return read_hdf5(path, dset)
        return read_hdf5(p, self.default_hdf5_path)

    def __len__(self) -> int:
        return len(self.data)

    def __iter__(self):
        return iter(self.data)

    def keys(self):
        return self.data.keys()

    def values(self):
        for key in self.keys():
            yield self[key]


class NpyScpLoader:
    """Lazy loader for scp files whose values point at .npy files."""

    def __init__(self, feats_scp: str):
        self.data = load_scp(feats_scp)

    def get_path(self, key: str) -> str:
        return self.data[key]

    def __getitem__(self, key: str) -> np.ndarray:
        return np.load(self.data[key])

    def __len__(self) -> int:
        return len(self.data)

    def __iter__(self):
        return iter(self.data)

    def keys(self):
        return self.data.keys()

    def values(self):
        for key in self.keys():
            yield self[key]


class WavScpLoader:
    """Loader for wav.scp; supports plain paths, trailing-pipe commands, and
    kaldi-style segments files.

    Piped entries ('... | sox ... -t wav - |') are executed with the shell
    and the wav read from stdout. With ``segments`` (lines
    ``utt_id rec_id start end`` in seconds), keys map to utterance segments
    sliced out of the recording.
    """

    def __init__(self, wav_scp: str, segments: str | None = None):
        self.data = load_scp(wav_scp)
        self.segments: dict[str, tuple[str, float, float]] | None = None
        if segments is not None:
            self.segments = {}
            with open(segments) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 4:
                        utt, rec, start, end = parts[:4]
                        self.segments[utt] = (rec, float(start), float(end))

    def _read(self, value: str) -> tuple[np.ndarray, int]:
        if value.endswith("|"):
            import io
            import subprocess

            proc = subprocess.run(value[:-1], shell=True, check=True,
                                  stdout=subprocess.PIPE)
            sr, data = wavfile.read(io.BytesIO(proc.stdout))
            return _pcm_to_float(data), int(sr)
        return read_wav(value)

    def __getitem__(self, key: str) -> tuple[np.ndarray, int]:
        if self.segments is not None:
            rec, start, end = self.segments[key]
            audio, sr = self._read(self.data[rec])
            return audio[int(start * sr): int(end * sr)], sr
        return self._read(self.data[key])

    def __len__(self) -> int:
        if self.segments is not None:
            return len(self.segments)
        return len(self.data)

    def __iter__(self):
        if self.segments is not None:
            return iter(self.segments)
        return iter(self.data)

    def keys(self):
        if self.segments is not None:
            return self.segments.keys()
        return self.data.keys()
