"""Import the reference repo (read-only numerical oracle) outside pytest.

Mirrors tests/conftest.py's `reference` fixture: the reference package
imports librosa/soundfile/resampy/kaldiio and the removed
scipy.signal.kaiser at module scope; none are installed here, so minimal
shims backed by our own parity-tested ops are injected first. Used by
tools/ scripts (e.g. cotrain_parity.py) that co-run the reference as a
training oracle.
"""

from __future__ import annotations

import importlib.machinery
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "articulatory"))


def _shim_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def import_reference():
    """Install compat shims and import the reference `articulatory` package."""
    import scipy.signal
    import scipy.signal.windows

    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser

    if "librosa" not in sys.modules:
        from articulatory_tpu.ops.mel import mel_filterbank

        librosa = _shim_module("librosa")
        filters = _shim_module("librosa.filters")

        def _mel(sr=None, n_fft=None, n_mels=128, fmin=0.0, fmax=None, **kw):
            return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

        filters.mel = _mel
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    if "soundfile" not in sys.modules:
        from articulatory_tpu.utils.io import read_wav, write_wav

        sf = _shim_module("soundfile")
        sf.read = lambda path, **kw: read_wav(path)
        sf.write = lambda path, data, sr, **kw: write_wav(path, data, sr)
        sys.modules["soundfile"] = sf
    if "resampy" not in sys.modules:
        from articulatory_tpu.ops.audio import resample as _resample

        resampy = _shim_module("resampy")
        resampy.resample = lambda x, orig, target, **kw: _resample(x, orig, target)
        sys.modules["resampy"] = resampy
    if "kaldiio" not in sys.modules:
        kaldiio = _shim_module("kaldiio")

        def _unavailable(*a, **k):
            raise RuntimeError("kaldiio shim: not implemented")

        kaldiio.load_scp = _unavailable
        kaldiio.ReadHelper = _unavailable
        sys.modules["kaldiio"] = kaldiio
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import articulatory

    return articulatory
