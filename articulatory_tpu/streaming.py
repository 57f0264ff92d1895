"""Streaming synthesis: feed articulatory feature chunks, get audio chunks.

A thin serving-oriented wrapper over the chunked-AR decode: the synthesizer
owns the AR ring buffer, accepts fixed-size feature chunks (the HiFi-CAR
training chunk, ``batch_max_steps / hop_size`` frames) and emits the
corresponding ``batch_max_steps`` audio samples per chunk with one jitted
forward each — constant memory and latency per chunk regardless of stream
length (reference semantics: decode.py:31-82).

The w2a inversion direction streams too (``dataset_mode: w2a`` — real-time
articulatory trajectory prediction from incoming acoustic features):
chunks are ``batch_max_steps`` input rows, the AR carry holds the past
``ar_input / out_channels`` output FRAMES, and a trailing sub-hop remainder
is dropped like the offline loop (reference decode.py:44-58).

Batched streams (one AR state per lane) serve many clients from one chip.

Latency notes (axon relay: ~30 ms dispatch+sync roundtrip):
- ``synthesize`` pipelines dispatch ``pipeline_depth`` chunks ahead of the
  host readback, hiding the roundtrip behind compute for all but the first
  chunk.
- ``synthesize_all`` runs the whole known stream as ONE compiled lax.scan
  dispatch (shares ``inference.ar_loop_scan``'s cached executables) — the
  lowest-latency path when the full feature stream is available up front.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.inference import LoadedModel, ar_loop_scan


class StreamingSynthesizer:
    def __init__(self, model: LoadedModel, config: dict, batch: int = 1):
        gp = config["generator_params"]
        self.model = model
        self.config = config
        self.hop = config["hop_size"]
        self.chunk_len = config["batch_max_steps"]
        self.w2a = config.get("dataset_mode") == "w2a"
        self.ar_input = gp.get("ar_input", 512)
        self.out_channels = gp.get("out_channels", 1)
        if self.w2a:
            # inversion: chunks are input ROWS; the carry counts FRAMES
            # (reference decode.py:46-48)
            self.chunk_frames = self.chunk_len
            self.carry_len = int(self.ar_input / self.out_channels)
        else:
            self.chunk_frames = self.chunk_len // self.hop
            self.carry_len = self.ar_input
        # shift-register AR: the window spans several chunks; the carry
        # slides left by one chunk's output per step (reference
        # decode.py:79-81). The reference compares against the SAMPLE chunk
        # length in both directions (decode.py:77).
        self.shift_register = self.carry_len > self.chunk_len
        assert self.out_channels == 1 or self.w2a \
            or not config.get("pqmf", False), \
            "multiband (PQMF) generators not supported in streaming mode; " \
            "use LoadedModel.inference / batched decode"
        self.batch = batch
        self.reset()

    def reset(self, lanes: slice | None = None) -> None:
        """Clear AR state (all lanes, or a slice for per-client resets)."""
        if lanes is None or not hasattr(self, "_prev"):
            self._prev = jnp.zeros((self.batch, self.carry_len,
                                    self.out_channels), jnp.float32)
        else:
            prev = np.asarray(self._prev)
            prev[lanes] = 0.0
            self._prev = jnp.asarray(prev)

    @functools.cached_property
    def _fwd(self):
        model = self.model
        carry_len = self.carry_len  # must match self._prev's reset shape
        shift_register = self.shift_register

        @jax.jit
        def fwd(params, cin, prev):
            params = model._materialize(params)
            out = model.model.apply({"params": params, **model.mutables},
                                    cin, ar=prev)
            if isinstance(out, tuple):
                out = out[0]
            if shift_register:
                new_prev = jnp.concatenate([prev[:, out.shape[1]:, :], out],
                                           axis=1)
            else:
                new_prev = out[:, -carry_len:, :]
            return out, new_prev

        return fwd

    def synthesize_chunk(self, feats: np.ndarray) -> np.ndarray:
        """feats: (batch, chunk_frames, C) or (chunk_frames, C) for batch=1.

        Returns (batch, chunk_frames * hop, out_channels) audio samples —
        or (batch, out_frames, out_channels) trajectories in w2a mode.
        """
        out = self.dispatch_chunk(feats)
        return np.asarray(out)

    def dispatch_chunk(self, feats: np.ndarray) -> jax.Array:
        """Like ``synthesize_chunk`` but returns the device array WITHOUT
        waiting for it — the caller controls when to pay the host-readback
        sync (pipelined serving)."""
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 2:
            feats = feats[None]
        assert feats.shape[0] == self.batch
        assert feats.shape[1] == self.chunk_frames, \
            f"streaming chunks must be {self.chunk_frames} frames"
        out, self._prev = self._fwd(self.model.params, jnp.asarray(feats),
                                    self._prev)
        return out

    def synthesize(self, feats: np.ndarray, pipeline_depth: int = 2):
        """Generator over a full (T, C) stream, yielding per-chunk audio.

        Keeps ``pipeline_depth`` chunk forwards in flight before each host
        readback, so the device computes chunk i+1 while the host consumes
        chunk i. The trailing partial chunk is zero-padded and trimmed (same
        contract as batched decode); in w2a mode a sub-hop remainder is
        dropped entirely (reference decode.py:57-58) and the tail trim is
        scaled by the model's output-frames-per-chunk ratio."""
        feats = np.asarray(feats, np.float32)
        t = len(feats)
        if self.w2a and 0 < t % self.chunk_frames < self.hop:
            t -= t % self.chunk_frames
        pad = (-t) % self.chunk_frames
        if pad:
            feats = np.pad(feats[:t], ((0, pad), (0, 0)))

        def trim(j, out):
            out = np.asarray(out[0])
            keep_in = min(self.chunk_frames, t - j)
            if self.w2a:
                return out[: keep_in * out.shape[0] // self.chunk_frames]
            return out[: keep_in * self.hop]

        starts = list(range(0, t + pad, self.chunk_frames))
        inflight: list[tuple[int, jax.Array]] = []
        for i in starts:
            inflight.append(
                (i, self.dispatch_chunk(feats[i:i + self.chunk_frames])))
            if len(inflight) > max(pipeline_depth, 1):
                j, out = inflight.pop(0)
                yield trim(j, out)
        for j, out in inflight:
            yield trim(j, out)

    def synthesize_all(self, feats: np.ndarray) -> np.ndarray:
        """Whole known (T, C) stream -> (T * hop,) audio — or (frames,
        out_channels) trajectories in w2a mode — in ONE compiled lax.scan
        dispatch (batch=1 lanes only). Matches the concatenation of
        ``synthesize`` chunks; shares ``ar_loop_scan``'s per-model compiled
        executables with bin/decode --ar-scan."""
        assert self.batch == 1, "synthesize_all is a single-lane path"
        return ar_loop_scan(self.model, np.asarray(feats, np.float32),
                            self.config)
