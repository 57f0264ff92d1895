"""ctypes binding for the native C++ batch-assembly engine (native/src/batcher.cpp).

``NativeBatcher`` memoizes the corpus in C++ memory and assembles
random-window GAN batches (audio crop + art crop + AR context) in a worker
pool, producing contiguous float32 buffers ready for ``jax.device_put``. If
the shared library has not been built, callers fall back to the Python
``SpeechCollater`` path transparently (see ``is_available``).

Build once per machine:
    cmake -S native -B native/build && cmake --build native/build -j
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_CANDIDATES = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "lib", "libarticulatory_native.so"),
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "libarticulatory_native.so"),
]

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_CANDIDATES:
        path = os.path.abspath(path)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.ab_create.restype = ctypes.c_void_p
            lib.ab_create.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int]
            lib.ab_destroy.argtypes = [ctypes.c_void_p]
            lib.ab_add_utterance.restype = ctypes.c_int64
            lib.ab_add_utterance.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                             ctypes.c_char_p]
            lib.ab_num_utterances.restype = ctypes.c_int64
            lib.ab_num_utterances.argtypes = [ctypes.c_void_p]
            lib.ab_art_dim.restype = ctypes.c_int64
            lib.ab_art_dim.argtypes = [ctypes.c_void_p]
            lib.ab_utt_frames.restype = ctypes.c_int64
            lib.ab_utt_frames.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.ab_collate.restype = ctypes.c_int
            lib.ab_collate.argtypes = [
                ctypes.c_void_p,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                ctypes.c_int, ctypes.c_uint64,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_void_p,
            ]
            _lib = lib
            return lib
    return None


def is_available() -> bool:
    return _load_lib() is not None


class NativeBatcher:
    """C++-backed corpus cache + random_window batch assembler (a2w mode)."""

    def __init__(self, batch_max_steps: int, hop_size: int, ar_len: int = 0,
                 n_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native batcher library not built; run "
                "`cmake -S native -B native/build && cmake --build native/build`")
        self._lib = lib
        self._h = lib.ab_create(batch_max_steps, hop_size, ar_len, n_threads)
        self.batch_max_steps = batch_max_steps
        self.hop_size = hop_size
        self.ar_len = ar_len
        self.frames = batch_max_steps // hop_size

    def add_utterance(self, audio_npy: str, art_npy: str) -> int:
        idx = self._lib.ab_add_utterance(self._h, audio_npy.encode(),
                                         art_npy.encode())
        if idx < 0:
            raise IOError(f"failed to load {audio_npy} / {art_npy}")
        return int(idx)

    def __len__(self) -> int:
        return int(self._lib.ab_num_utterances(self._h))

    @property
    def art_dim(self) -> int:
        return int(self._lib.ab_art_dim(self._h))

    def utt_frames(self, idx: int) -> int:
        return int(self._lib.ab_utt_frames(self._h, idx))

    def collate(self, indices, seed: int) -> dict:
        n = len(indices)
        idx = np.asarray(indices, np.int64)
        audio = np.empty((n, self.batch_max_steps), np.float32)
        art = np.empty((n, self.frames, self.art_dim), np.float32)
        ar = (np.empty((n, self.ar_len), np.float32)
              if self.ar_len > 0 else None)
        status = self._lib.ab_collate(
            self._h, idx, n, ctypes.c_uint64(seed), audio, art,
            ar.ctypes.data_as(ctypes.c_void_p) if ar is not None else None)
        if status != 0:
            raise ValueError("ab_collate failed (utterance shorter than window?)")
        out = {"x": (art,), "y": audio[..., None], "audio": audio[..., None],
               "art": art}
        if ar is not None:
            out["ar"] = ar[..., None]
        return out

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.ab_destroy(self._h)
            self._h = None


class NativeDataLoader:
    """Epoch iterator over a NativeBatcher corpus (a2w / random_window).

    Drop-in for data.loader.DataLoader in the hot training path: shuffling
    and sharding happen on the index space; crop/pack runs in the C++ worker
    pool. Utterances shorter than the window are skipped up front (the
    Python collater drops them per batch).
    """

    def __init__(self, dataset, *, batch_size: int, batch_max_steps: int,
                 hop_size: int, ar_len: int = 0, seed: int = 0,
                 shard_id: int = 0, num_shards: int = 1, n_threads: int = 8,
                 cache_dir: str | None = None):
        self.batcher = NativeBatcher(batch_max_steps, hop_size, ar_len,
                                     n_threads)
        self.batch_size = batch_size
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch = 0
        frames = batch_max_steps // hop_size

        # feed the corpus: audio must be .npy for the C++ reader; hdf5 dumps
        # are materialized once into a sidecar cache
        for i in range(len(dataset)):
            audio_path = dataset.audio_files[i]
            art_path = dataset.art_files[i]
            if audio_path.endswith(".h5"):
                cache = cache_dir or os.path.join(
                    os.path.dirname(audio_path), ".native_cache")
                os.makedirs(cache, exist_ok=True)
                npy_path = os.path.join(
                    cache, os.path.basename(audio_path) + "-wave.npy")
                if not os.path.exists(npy_path):
                    from articulatory_tpu.utils.io import read_hdf5

                    np.save(npy_path,
                            read_hdf5(audio_path, "wave").astype(np.float32))
                audio_path = npy_path
            self.batcher.add_utterance(audio_path, art_path)
        # usable utterances only
        self.indices = [i for i in range(len(self.batcher))
                        if self.batcher.utt_frames(i) > frames]

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = -(-len(self.indices) // self.num_shards)  # wrap-padded shard
        return n // self.batch_size

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        order = np.asarray(self.indices)
        rng.shuffle(order)
        if self.num_shards > 1:
            # wrap-pad so every host yields the SAME number of batches
            # (DistributedSampler parity, same rationale as loader.py) —
            # unequal shards would deadlock multi-host SPMD collectives
            total = -(-len(order) // self.num_shards) * self.num_shards
            if total > len(order):
                order = np.concatenate([order, order[: total - len(order)]])
        order = order[self.shard_id::self.num_shards]
        for bi, i in enumerate(range(0, len(order) - self.batch_size + 1,
                                     self.batch_size)):
            idxs = order[i:i + self.batch_size]
            seed = (self.seed * 1_000_003 + self.epoch * 7919 + bi) & 0xFFFFFFFF
            yield self.batcher.collate(list(idxs), seed)
