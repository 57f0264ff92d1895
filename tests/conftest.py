"""Test configuration: force CPU with 8 virtual devices (fake TPU mesh).

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize imports jax at interpreter startup (before
# this conftest runs), freezing jax_platforms from the env. Override via the
# config API, which works as long as no backend has been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def _reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "articulatory"))


requires_reference = pytest.mark.skipif(
    not _reference_available(), reason="reference oracle repo not mounted")


@pytest.fixture(scope="session")
def reference():
    """Import the reference package (read-only oracle) with compat shims."""
    if not _reference_available():
        pytest.skip("reference repo not available")
    import scipy.signal
    import scipy.signal.windows
    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser
    import importlib.machinery

    def _shim_module(name):
        # a real ModuleSpec so importlib.util.find_spec(name) works on the
        # shim — transformers probes optional deps that way, and a module
        # with __spec__ = None makes find_spec raise ValueError (breaks the
        # SSL-inversion tests when they run after reference-fixture tests)
        import types

        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    if "librosa" not in sys.modules:
        # minimal librosa shim (not installed here): only filters.mel, backed
        # by our own librosa-parity implementation, so reference modules that
        # import librosa at module scope can load.
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
        # scipy-backed soundfile shim (module-level import in reference decode)
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
            raise RuntimeError("kaldiio shim: not implemented in tests")

        kaldiio.load_scp = _unavailable
        kaldiio.ReadHelper = _unavailable
        sys.modules["kaldiio"] = kaldiio
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import articulatory  # noqa: F401
    return articulatory


@pytest.fixture
def rng():
    return np.random.default_rng(0)
