"""Multi-resolution STFT loss (pure functions over jax arrays).

Parity target: reference articulatory/losses/stft_loss.py. Each resolution
returns (spectral convergence = ||Y - X||_F / ||Y||_F, log-magnitude L1);
the multi-resolution wrapper averages them, flattening (B, C, T) subband
signals to (B*C, T) first.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from articulatory_tpu.ops.stft import stft_magnitude

Array = jax.Array


class STFTLoss:
    """Single-resolution STFT loss."""

    def __init__(self, fft_size: int = 1024, shift_size: int = 120,
                 win_length: int = 600, window: str = "hann_window"):
        self.fft_size = fft_size
        self.shift_size = shift_size
        self.win_length = win_length
        assert window in ("hann", "hann_window")

    def __call__(self, x: Array, y: Array) -> tuple[Array, Array]:
        """x, y: predicted / groundtruth signals (B, T)."""
        x_mag = stft_magnitude(x, n_fft=self.fft_size, hop=self.shift_size,
                               win_length=self.win_length, eps=1e-7)
        y_mag = stft_magnitude(y, n_fft=self.fft_size, hop=self.shift_size,
                               win_length=self.win_length, eps=1e-7)
        sc_loss = jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)
        mag_loss = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
        return sc_loss, mag_loss


class MultiResolutionSTFTLoss:
    """Average of N STFT losses at different resolutions."""

    def __init__(self, fft_sizes: Sequence[int] = (1024, 2048, 512),
                 hop_sizes: Sequence[int] = (120, 240, 50),
                 win_lengths: Sequence[int] = (600, 1200, 240),
                 window: str = "hann_window"):
        assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
        self.losses = [STFTLoss(f, s, w, window)
                       for f, s, w in zip(fft_sizes, hop_sizes, win_lengths)]

    def __call__(self, x: Array, y: Array) -> tuple[Array, Array]:
        """x, y: (B, T) or (B, T, C) multiband; returns (sc_loss, mag_loss)."""
        if x.ndim == 3:
            # (B, T, C) -> (B*C, T), matching the reference's (B, C, T) flatten
            x = jnp.swapaxes(x, 1, 2).reshape(-1, x.shape[1])
            y = jnp.swapaxes(y, 1, 2).reshape(-1, y.shape[1])
        sc_loss = 0.0
        mag_loss = 0.0
        for f in self.losses:
            sc, mag = f(x, y)
            sc_loss += sc
            mag_loss += mag
        return sc_loss / len(self.losses), mag_loss / len(self.losses)
