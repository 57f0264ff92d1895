"""Pseudo-QMF multiband filterbank (analysis/synthesis) for multiband vocoding.

Filter design follows the Kaiser-window cosine-modulated filterbank recipe the
reference uses (reference: articulatory/layers/pqmf.py:15-120): a lowpass
prototype windowed by Kaiser(beta), cosine-modulated into per-subband
analysis/synthesis filters with alternating ±π/4 phase. Analysis is a strided
conv (filter + decimate fused); synthesis is an input-dilated conv (upsample
+ filter fused) — both single XLA convolutions in NLC layout, rather than
the reference's separate filter-then-up/down-sample convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from scipy.signal.windows import kaiser


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.142,
                            beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed lowpass prototype, ``(taps + 1,)``."""
    assert taps % 2 == 0, "The number of taps must be an even number."
    assert 0.0 < cutoff_ratio < 1.0, "Cutoff ratio must be in (0, 1)."
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio  # sinc(0) limit
    return h_i * kaiser(taps + 1, beta)


def pqmf_filterbanks(subbands: int = 4, taps: int = 62, cutoff_ratio: float = 0.142,
                     beta: float = 9.0) -> tuple[np.ndarray, np.ndarray]:
    """Cosine-modulated analysis/synthesis banks, each ``(subbands, taps + 1)``."""
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    n = np.arange(taps + 1) - taps / 2
    k = np.arange(subbands)[:, None]
    phase = (2 * k + 1) * (np.pi / (2 * subbands)) * n[None, :]
    sign = ((-1.0) ** np.arange(subbands))[:, None]
    h_analysis = 2 * h_proto[None, :] * np.cos(phase + sign * np.pi / 4)
    h_synthesis = 2 * h_proto[None, :] * np.cos(phase - sign * np.pi / 4)
    return h_analysis.astype(np.float32), h_synthesis.astype(np.float32)


class PQMF:
    """Analysis/synthesis filterbank over NLC signals.

    ``analysis``:  ``(B, T, 1) -> (B, T // subbands, subbands)``
    ``synthesis``: ``(B, T // subbands, subbands) -> (B, T, 1)``
    """

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.142, beta: float = 9.0):
        self.subbands = subbands
        self.taps = taps
        h_analysis, h_synthesis = pqmf_filterbanks(subbands, taps, cutoff_ratio, beta)
        # analysis kernel (K, 1, subbands): one input channel -> subband channels
        self.analysis_filter = jnp.asarray(h_analysis.T[:, None, :])
        # synthesis kernel (K, subbands, 1). No time flip: the reference's
        # conv_transpose with the one-hot updown filter is pure zero-stuffing
        # and the synthesis filter itself is applied by plain cross-correlation.
        self.synthesis_filter = jnp.asarray(h_synthesis.T[:, :, None])

    def analysis(self, x: jax.Array) -> jax.Array:
        # padding (pad, pad - (subbands-1)) reproduces the reference's
        # pad -> conv -> strided-downsample chain exactly, INCLUDING for
        # non-divisible T: the reference's updown filter has kernel length
        # `subbands`, so its output is floor((T - subbands)/subbands) + 1
        # frames — verified against a torch re-enactment at T=1001, s=4
        # (both give 250 frames, not ceil(T/s)=251)
        pad = self.taps // 2
        y = lax.conv_general_dilated(
            x, self.analysis_filter,
            window_strides=(self.subbands,),
            padding=[(pad, pad - (self.subbands - 1))],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y

    def synthesis(self, x: jax.Array) -> jax.Array:
        # upsample-by-subbands (scale by subbands, matching the reference's
        # power compensation) fused with the synthesis filter as one
        # input-dilated conv. Output sample t sums filter taps aligned with
        # the zero-stuffed signal; padding reproduces
        # conv1d(pad(taps//2), h_syn) after conv_transpose up-sampling.
        pad = self.taps // 2
        y = lax.conv_general_dilated(
            x, self.synthesis_filter * self.subbands,
            window_strides=(1,),
            padding=[(pad, pad + (self.subbands - 1))],
            lhs_dilation=(self.subbands,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y
