"""Mel-spectrogram L1 loss (reference: articulatory/losses/mel_loss.py).

The mel matrix is designed once on host (librosa-parity, slaney norm) and
closed over by the jitted loss; STFT numerics follow torch.stft
(centered, reflect pad, clamp eps before sqrt).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.ops.mel import mel_filterbank
from articulatory_tpu.ops.stft import stft

Array = jax.Array


class MelSpectrogram:
    """Log-mel spectrogram ``(B, T) -> (B, #frames, num_mels)``."""

    def __init__(self, fs: int = 22050, fft_size: int = 1024, hop_size: int = 256,
                 win_length: int | None = None, window: str = "hann",
                 num_mels: int = 80, fmin: float | None = 80,
                 fmax: float | None = 7600, center: bool = True,
                 normalized: bool = False, onesided: bool = True,
                 eps: float = 1e-10, log_base: float | None = 10.0):
        assert not normalized and onesided
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.win_length = fft_size if win_length is None else win_length
        self.window = window
        self.center = center
        self.eps = eps
        self.log_base = log_base
        fmin = 0 if fmin is None else fmin
        fmax = fs / 2 if fmax is None else fmax
        self.melmat = jnp.asarray(
            mel_filterbank(fs, fft_size, num_mels, fmin, fmax).T)

    def __call__(self, x: Array) -> Array:
        if x.ndim == 3:
            # (B, T, C) -> (B*C, T)
            x = jnp.swapaxes(x, 1, 2).reshape(-1, x.shape[1])
        z = stft(x, n_fft=self.fft_size, hop=self.hop_size,
                 win_length=self.win_length, window=self.window, center=self.center)
        power = jnp.real(z) ** 2 + jnp.imag(z) ** 2
        amp = jnp.sqrt(jnp.clip(power, min=self.eps))
        mel = jnp.clip(amp @ self.melmat, min=self.eps)
        if self.log_base is None:
            return jnp.log(mel)
        if self.log_base == 10.0:
            return jnp.log10(mel)
        if self.log_base == 2.0:
            return jnp.log2(mel)
        raise ValueError(f"log_base: {self.log_base} is not supported.")


class MelSpectrogramLoss:
    """L1 between generated and groundtruth log-mels."""

    def __init__(self, **kwargs):
        self.mel_spectrogram = MelSpectrogram(**kwargs)

    def __call__(self, y_hat: Array, y: Array) -> Array:
        """y_hat, y: (B, T) or (B, T, C) waveforms."""
        mel_hat = self.mel_spectrogram(y_hat)
        mel = self.mel_spectrogram(y)
        return jnp.mean(jnp.abs(mel_hat - mel))
