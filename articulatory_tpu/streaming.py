"""Streaming synthesis: feed articulatory feature chunks, get audio chunks.

A thin serving-oriented wrapper over the chunked-AR decode: the synthesizer
owns the AR ring buffer, accepts fixed-size feature chunks (the HiFi-CAR
training chunk, ``batch_max_steps / hop_size`` frames) and emits the
corresponding ``batch_max_steps`` audio samples per chunk with one jitted
forward each — constant memory and latency per chunk regardless of stream
length (reference semantics: decode.py:31-82).

Batched streams (one AR state per lane) serve many clients from one chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.inference import LoadedModel


class StreamingSynthesizer:
    def __init__(self, model: LoadedModel, config: dict, batch: int = 1):
        gp = config["generator_params"]
        self.model = model
        self.hop = config["hop_size"]
        self.chunk_frames = config["batch_max_steps"] // self.hop
        self.ar_input = gp.get("ar_input", 512)
        self.out_channels = gp.get("out_channels", 1)
        assert self.ar_input <= config["batch_max_steps"], \
            "shift-register AR not supported in streaming mode"
        assert self.out_channels == 1 or not config.get("pqmf", False), \
            "multiband (PQMF) generators not supported in streaming mode; " \
            "use LoadedModel.inference / batched decode"
        self.batch = batch
        self.reset()

    def reset(self, lanes: slice | None = None) -> None:
        """Clear AR state (all lanes, or a slice for per-client resets)."""
        if lanes is None or not hasattr(self, "_prev"):
            self._prev = jnp.zeros((self.batch, self.ar_input,
                                    self.out_channels), jnp.float32)
        else:
            prev = np.asarray(self._prev)
            prev[lanes] = 0.0
            self._prev = jnp.asarray(prev)

    @functools.cached_property
    def _fwd(self):
        model = self.model
        ar_input = self.ar_input  # must match self._prev's reset shape

        @jax.jit
        def fwd(params, cin, prev):
            out = model.model.apply({"params": params, **model.mutables},
                                    cin, ar=prev)
            if isinstance(out, tuple):
                out = out[0]
            return out, out[:, -ar_input:, :]

        return fwd

    def synthesize_chunk(self, feats: np.ndarray) -> np.ndarray:
        """feats: (batch, chunk_frames, C) or (chunk_frames, C) for batch=1.

        Returns (batch, chunk_frames * hop, out_channels) audio samples.
        """
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        assert feats.shape[0] == self.batch
        assert feats.shape[1] == self.chunk_frames, \
            f"streaming chunks must be {self.chunk_frames} frames"
        out, self._prev = self._fwd(self.model.params, jnp.asarray(feats),
                                    self._prev)
        return np.asarray(out)

    def synthesize(self, feats: np.ndarray):
        """Generator over a full (T, C) stream, yielding per-chunk audio.

        The trailing partial chunk is zero-padded and trimmed (same contract
        as batched decode)."""
        t = len(feats)
        pad = (-t) % self.chunk_frames
        if pad:
            feats = np.pad(feats, ((0, pad), (0, 0)))
        for i in range(0, len(feats), self.chunk_frames):
            audio = self.synthesize_chunk(feats[i:i + self.chunk_frames])[0]
            valid = min(self.chunk_frames, t - i) * self.hop
            yield audio[:valid]
