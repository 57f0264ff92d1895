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
            # np.asarray on a device array is a read-only view; copy
            prev = np.array(self._prev)
            prev[lanes] = 0.0
            self._prev = jnp.asarray(prev)

    @functools.cached_property
    def _fwd(self):
        """Jitted chunk step: ``fwd(params, cin, prev[, mask])``.

        ``mask`` (a (lanes,) bool array, or None — a static trace-time
        choice) keeps unmasked lanes' AR carries unchanged; the
        StreamingServer's stalled/idle lanes ride the same body."""
        model = self.model
        carry_len = self.carry_len  # must match self._prev's reset shape
        shift_register = self.shift_register
        w2a = self.w2a

        @jax.jit
        def fwd(params, cin, prev, mask=None):
            params = model._materialize(params)
            out = model.model.apply({"params": params, **model.mutables},
                                    cin, ar=prev)
            if isinstance(out, tuple):
                out = out[0]
            if shift_register:
                # slide by input rows in w2a, output length in a2w — the
                # reference's rule (decode.py:79-81), same as the ar_loop /
                # _get_scan_fn paths
                shift = cin.shape[1] if w2a else out.shape[1]
                new_prev = jnp.concatenate([prev[:, shift:, :], out],
                                           axis=1)
            else:
                new_prev = out[:, -carry_len:, :]
            if mask is not None:
                new_prev = jnp.where(mask[:, None, None], new_prev, prev)
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


class StreamingServer:
    """Continuous-batching stream server: clients join and leave mid-serve.

    ``StreamingSynthesizer`` requires all lanes joined up front and stepped
    in lockstep; real serving has ragged arrivals. This server runs ONE
    fixed ``max_lanes``-wide executable for the lifetime of the process:
    occupancy changes only flip a host-side mask, never the compiled shape,
    so lane churn (join/leave/stall) costs zero recompiles and idle lanes
    ride the same dispatch as full ones.

    Correctness invariants (tests/test_streaming.py):
    - lanes are batch-independent through the generator, so a lane's output
      never depends on its neighbours' occupancy or data;
    - a lane that skips a round keeps its AR carry (the carry update is
      masked INSIDE the jitted step, so stalled lanes cost no extra
      dispatch);
    - a joining lane starts from a zeroed carry and produces bit-identical
      output to a fresh decode of the same stream in the same geometry.

    Extends the reference's single-stream chunked AR contract
    (decode.py:31-82) to multi-tenant serving; the reference has no server.
    """

    def __init__(self, model: LoadedModel, config: dict, max_lanes: int = 16):
        self.syn = StreamingSynthesizer(model, config, batch=max_lanes)
        self.max_lanes = max_lanes
        self._lane_of: dict[object, int] = {}
        self._free = list(range(max_lanes))[::-1]  # pop() -> lowest index

    # -- admission ---------------------------------------------------------

    def join(self, client_id) -> int:
        """Admit a stream; returns its lane index. O(1), one tiny device op
        to zero the lane's AR carry."""
        if client_id in self._lane_of:
            raise ValueError(f"client {client_id!r} already joined")
        if not self._free:
            raise RuntimeError(
                f"server full ({self.max_lanes} lanes); leave() a stream "
                f"first or build a wider server")
        lane = self._free.pop()
        self._lane_of[client_id] = lane
        # zero the lane's carry with a fixed-shape device multiply: no host
        # readback (which would sync the dispatch stream) and one compiled
        # executable for every lane index
        keep = np.ones((self.max_lanes,), np.float32)
        keep[lane] = 0.0
        self.syn._prev = self.syn._prev * jnp.asarray(keep)[:, None, None]
        return lane

    def leave(self, client_id) -> None:
        """Retire a stream; its slot becomes reusable immediately."""
        lane = self._lane_of.pop(client_id)
        self._free.append(lane)

    @property
    def active(self) -> list:
        return list(self._lane_of)

    # -- serving -----------------------------------------------------------

    def step(self, chunks: dict) -> dict:
        """One serving round: ``{client_id: (t, C) feature chunk}`` ->
        ``{client_id: output array}``.

        Each submitted chunk is at most ``chunk_frames`` rows; a shorter
        final chunk is zero-padded through the fixed executable and its
        output trimmed (a2w: ``t * hop`` samples; w2a: the model's
        output-frame ratio, with the reference's sub-hop remainder drop
        applied by the caller ending the stream). Joined clients absent
        from ``chunks`` stall this round and keep their AR carry."""
        syn = self.syn
        if not chunks:
            return {}
        unknown = [c for c in chunks if c not in self._lane_of]
        if unknown:
            raise KeyError(f"clients not joined: {unknown!r}")
        # normalize BEFORE reading feat_dim: a 1-D chunk is (t,) -> (t, 1)
        norm = {}
        for cid, chunk in chunks.items():
            chunk = np.asarray(chunk, np.float32)
            if chunk.ndim == 1:
                chunk = chunk[:, None]
            t = len(chunk)
            if not 0 < t <= syn.chunk_frames:
                raise ValueError(
                    f"chunk for {cid!r} must be 1..{syn.chunk_frames} "
                    f"frames, got {t}")
            norm[cid] = chunk
        feat_dim = next(iter(norm.values())).shape[-1]
        batch = np.zeros((self.max_lanes, syn.chunk_frames, feat_dim),
                         np.float32)
        mask = np.zeros((self.max_lanes,), bool)
        lens = {}
        for cid, chunk in norm.items():
            lane = self._lane_of[cid]
            batch[lane, : len(chunk)] = chunk
            mask[lane] = True
            lens[cid] = len(chunk)
        out, self.syn._prev = syn._fwd(
            syn.model.params, jnp.asarray(batch), self.syn._prev,
            jnp.asarray(mask))
        # full-batch readback + host indexing: a device gather of only the
        # submitted rows would have an occupancy-dependent shape, and every
        # occupancy change would pay a fresh remote compile (measured: 3.5 s
        # per churn round vs ~50 ms steady) — the fixed-shape transfer is
        # what keeps churn rounds on the one compiled executable
        got = np.asarray(out)
        results = {}
        for cid in chunks:
            t = lens[cid]
            if syn.w2a:
                keep = t * got.shape[1] // syn.chunk_frames
            else:
                keep = t * syn.hop
            results[cid] = got[self._lane_of[cid], :keep]
        return results
