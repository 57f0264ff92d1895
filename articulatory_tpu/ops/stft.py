"""STFT / log-mel feature ops — jittable JAX and numpy reference versions.

Numerics are matched to the reference's two STFT call sites:

- feature extraction: ``librosa.stft(center=True, pad_mode='reflect')`` then
  mel matmul then log10 (reference: articulatory/bin/preprocess.py:26-82);
- losses: ``torch.stft(center=True, pad_mode='reflect')`` magnitudes with a
  ``clamp(min=eps)`` before sqrt/log (reference:
  articulatory/losses/stft_loss.py:16-40, losses/mel_loss.py:16-111).

Both conventions are the same centered framing: pad ``n_fft//2`` on each
side (reflect), periodic Hann window of ``win_length`` zero-padded centered
to ``n_fft``, ``1 + T // hop`` frames.

On TPU the rFFT is lowered by XLA; framing uses
``conv_general_dilated_patches`` so the overlapping gather is a strided
window op rather than a per-frame gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from articulatory_tpu.ops.mel import mel_filterbank


def periodic_hann(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to torch.hann_window / scipy fftbins=True."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


def _padded_window(window: str | np.ndarray, win_length: int, n_fft: int,
                   dtype=np.float32) -> np.ndarray:
    if isinstance(window, str):
        if window not in ("hann", "hann_window"):
            raise ValueError(f"Unsupported window: {window}")
        w = periodic_hann(win_length, dtype=np.float64)
    else:
        w = np.asarray(window, dtype=np.float64)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    return w.astype(dtype)


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Extract overlapping frames: ``(..., T) -> (..., n_frames, frame_length)``.

    Uses conv patches so XLA emits a single strided window op.
    """
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    n_frames = (t - frame_length) // hop + 1
    x2 = x.reshape((-1, t, 1))
    patches = lax.conv_general_dilated_patches(
        x2,
        filter_shape=(frame_length,),
        window_strides=(hop,),
        padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, n_frames, frame_length)
    return patches.reshape(batch_shape + (n_frames, frame_length))


# NOTE on the STFT formulation: benchmarks/stft_variants_bench.py A/Bed
# three formulations at the flagship mel-loss shapes on v5e (fwd / fwd+bwd
# ms, pipelined-sync timing): rfft 1.66 / 4.41; framed DFT-matmul 2.31 /
# 4.45; strided-conv DFT 3.12 / 16.87 (its input gradient is an lhs-dilated
# conv XLA lowers badly). jnp.fft.rfft wins — stft() below uses plain rfft;
# the losing variants (incl. the rDFT basis builder) live in the benchmark.


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "window", "center"))
def stft(x: jax.Array, *, n_fft: int, hop: int, win_length: int | None = None,
         window: str = "hann", center: bool = True) -> jax.Array:
    """Complex STFT ``(..., T) -> (..., n_frames, n_fft//2 + 1)``."""
    if win_length is None:
        win_length = n_fft
    # window built in f64 and cast ONCE to the input dtype, so f64 inputs
    # (jax_enable_x64 parity runs, tools/cotrain_parity.py) see a full-
    # precision window exactly like torch.hann_window(dtype=x.dtype)
    w = jnp.asarray(_padded_window(window, win_length, n_fft, dtype=np.float64),
                    dtype=x.dtype)
    if center:
        pad = n_fft // 2
        pad_cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_cfg, mode="reflect")
    return jnp.fft.rfft(frame_signal(x, n_fft, hop) * w, axis=-1)


def stft_magnitude(x: jax.Array, *, n_fft: int, hop: int,
                   win_length: int | None = None, window: str = "hann",
                   center: bool = True, eps: float = 1e-7) -> jax.Array:
    """Magnitude spectrogram with the reference's power clamp.

    ``sqrt(clamp(re^2 + im^2, min=eps))`` — matching stft_loss.py:40
    (eps=1e-7) and mel_loss.py:105-106 (eps=1e-10).
    """
    z = stft(x, n_fft=n_fft, hop=hop, win_length=win_length, window=window, center=center)
    power = jnp.real(z) ** 2 + jnp.imag(z) ** 2
    return jnp.sqrt(jnp.clip(power, min=eps))


def _apply_log(x: jax.Array, log_base: float | None):
    if log_base is None:
        return jnp.log(x)
    if log_base == 10.0:
        return jnp.log10(x)
    if log_base == 2.0:
        return jnp.log2(x)
    raise ValueError(f"log_base {log_base} is not supported.")


def logmelfilterbank(audio: jax.Array, sampling_rate: int, *, fft_size: int = 1024,
                     hop_size: int = 256, win_length: int | None = None,
                     window: str = "hann", num_mels: int = 80,
                     fmin: float | None = None, fmax: float | None = None,
                     eps: float = 1e-10, log_base: float | None = 10.0) -> jax.Array:
    """Log-mel filterbank features ``(..., T) -> (..., n_frames, num_mels)``.

    Jittable equivalent of the reference's feature extractor
    (preprocess.py:26-82): amplitude STFT → mel matmul → clamp → log.
    """
    fmin = 0 if fmin is None else fmin
    fmax = sampling_rate / 2 if fmax is None else fmax
    mel_t = jnp.asarray(
        mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax).T)
    # librosa takes |stft| with no clamp before the mel matmul
    z = stft(audio, n_fft=fft_size, hop=hop_size, win_length=win_length, window=window)
    spc = jnp.abs(z)
    mel = jnp.maximum(eps, spc @ mel_t)
    return _apply_log(mel, log_base)


def logmelfilterbank_np(audio: np.ndarray, sampling_rate: int, *, fft_size: int = 1024,
                        hop_size: int = 256, win_length: int | None = None,
                        window: str = "hann", num_mels: int = 80,
                        fmin: float | None = None, fmax: float | None = None,
                        eps: float = 1e-10, log_base: float | None = 10.0) -> np.ndarray:
    """Pure-numpy log-mel (host-side preprocessing path, float64 accumulation)."""
    if win_length is None:
        win_length = fft_size
    w = _padded_window(window, win_length, fft_size, dtype=np.float64)
    pad = fft_size // 2
    x = np.pad(audio.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = (len(x) - fft_size) // hop_size + 1
    idx = np.arange(fft_size)[None, :] + hop_size * np.arange(n_frames)[:, None]
    frames = x[idx] * w
    spc = np.abs(np.fft.rfft(frames, axis=-1))  # (#frames, #bins)
    fmin = 0 if fmin is None else fmin
    fmax = sampling_rate / 2 if fmax is None else fmax
    mel_basis = mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax,
                               dtype=np.float64)
    mel = np.maximum(eps, spc @ mel_basis.T)
    if log_base is None:
        out = np.log(mel)
    elif log_base == 10.0:
        out = np.log10(mel)
    elif log_base == 2.0:
        out = np.log2(mel)
    else:
        raise ValueError(f"log_base {log_base} is not supported.")
    return out.astype(np.float32)
