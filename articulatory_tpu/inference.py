"""Inference runtime: model loading, full-utterance synthesis, and the
chunked-autoregressive decode loop (HiFi-CAR).

Parity targets: ``load_model`` (reference utils/utils.py:294-372) and
``ar_loop`` (reference bin/decode.py:31-100), including the w2a direction,
the shift-register AR update, and the 50%-overlap WSOLA variant.

TPU notes: per-chunk forwards are jitted once per distinct chunk shape (the
body chunks share one executable; only a short final chunk triggers a second
compile). The AR recurrence itself is host-driven — chunk counts are tiny
(≈ tens) and each chunk is a full conv-network forward, so dispatch overhead
is negligible versus compute; see also ``ar_loop_scan`` for the fully
compiled scan path used in benchmarking.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.config import (
    fix_generator_params,
    inject_time_packing,
    load_config,
)
from articulatory_tpu.models import build_model
from articulatory_tpu.ops.interp import interpolate_linear_scale
from articulatory_tpu.ops.pqmf import PQMF
from articulatory_tpu.utils.io import read_hdf5


@dataclasses.dataclass
class LoadedModel:
    model: Any
    params: Any
    config: dict
    mutables: dict
    mean: np.ndarray | None = None
    scale: np.ndarray | None = None
    pqmf: PQMF | None = None
    sp_mesh: Any = None  # set via enable_sequence_parallel
    quantized: bool = False  # int8 weight leaves (see quantize_int8)

    @property
    def variables(self):
        return {"params": self.params, **self.mutables}

    def enable_sequence_parallel(self, n: int, devices=None) -> None:
        """Shard the TIME axis of full-utterance forwards over ``n`` devices.

        The generator is fully convolutional, so GSPMD inserts halo
        exchanges between neighboring time shards (parallel/sp.py); each
        device holds 1/n of the activations — the memory-bounded path for
        very long non-AR utterances. AR chunked decode is serial and tiny
        per chunk; SP does not apply to it (the forward falls back to the
        unsharded path whenever ``ar`` is fed).
        """
        from jax.sharding import Mesh

        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < n:
            raise ValueError(
                f"sequence parallelism needs {n} devices, have {len(devices)}")
        self.sp_mesh = Mesh(np.asarray(devices[:n]).reshape(1, n),
                            ("data", "model"))
        self.__dict__.pop("_jit_forward_sp", None)  # re-jit on a new mesh

    def normalize(self, c: jax.Array) -> jax.Array:
        if self.mean is None:
            return c
        return (c - jnp.asarray(self.mean)) / jnp.asarray(self.scale)

    def quantize_int8(self) -> None:
        """Fold weight norm and store conv/dense kernels as int8 (symmetric
        per-out-channel); every forward dequantizes inside jit. HBM reads
        the 4x-smaller weights; under the scan decode the dequant is
        loop-invariant and hoisted. Quality gate: tools/int8_quality_ab.sh.
        """
        from articulatory_tpu.utils.quantize import quantize_params_int8

        self.remove_weight_norm()
        self.params = jax.tree.map(
            jnp.asarray, quantize_params_int8(jax.device_get(self.params)))
        self.quantized = True
        for cached in ("_jit_forward", "_jit_forward_sp", "_ar_scan_cache"):
            self.__dict__.pop(cached, None)

    def to_bf16_weights(self) -> None:
        """Fold weight norm and STORE all float params as bfloat16.

        Serve-time weight residency (VERDICT r4 #8): HBM holds half the
        weight bytes. The decode-side roofline (benchmarks/
        decode_breakdown.py, DESIGN.md §7) shows where this matters:
        the SINGLE-STREAM scan re-reads the full parameter set every chunk
        and runs weight-bandwidth-bound (~69 % of HBM peak), so halving
        weight traffic attacks its critical path; the BATCHED knee is
        activation-bound and expects neutrality (like int8 was). Under the
        default hybrid-precision compute the bf16 interior layers already
        cast weights to bf16 per dispatch, so for them bf16 STORAGE is
        numerically identical; only the f32 AR-path layers see the
        storage rounding (one bf16 round-trip of their weights — far
        smaller than int8's 2^-7 channel-max rounding that failed the
        budget). Quality gate: tools/bf16_weights_quality_ab.sh.
        """
        if self.quantized:
            raise ValueError(
                "to_bf16_weights on an int8-quantized model would cast the "
                "dequantization scales to bf16 (silent extra rounding); "
                "pick one weight-compression scheme")
        self.remove_weight_norm()
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            self.params)
        for cached in ("_jit_forward", "_jit_forward_sp", "_ar_scan_cache"):
            self.__dict__.pop(cached, None)

    def _materialize(self, params):
        """Dequantize int8 weight leaves (traced; no-op when unquantized)."""
        if not self.quantized:
            return params
        from articulatory_tpu.utils.quantize import dequantize_params

        return dequantize_params(params)

    @functools.cached_property
    def _jit_forward(self):
        def fwd(params, c, ar):
            params = self._materialize(params)
            kwargs = {} if ar is None else {"ar": ar}
            out = self.model.apply({"params": params, **self.mutables}, c, **kwargs)
            if isinstance(out, tuple):
                out = out[0]
            return out

        return jax.jit(fwd)

    @functools.cached_property
    def _jit_forward_sp(self):
        from articulatory_tpu.parallel.sp import time_sharding

        def fwd(params, c):
            params = self._materialize(params)
            out = self.model.apply({"params": params, **self.mutables}, c)
            if isinstance(out, tuple):
                out = out[0]
            return out

        # keep the whole network time-sharded instead of gathering at the end
        return jax.jit(fwd, out_shardings=time_sharding(self.sp_mesh, 3))

    def __call__(self, c: jax.Array, ar: jax.Array | None = None) -> jax.Array:
        if self.sp_mesh is not None and ar is None:
            from articulatory_tpu.parallel.sp import shard_time

            # device_put with a time sharding requires T % n == 0 — pad up
            # and trim the upsampled tail (same boundary caveat as
            # ``bucket_frames``: only the last receptive-field window of a
            # padded forward can differ marginally from exact-length).
            c = jnp.asarray(c)
            n = self.sp_mesh.shape["model"]
            t = c.shape[1]
            pad = -t % n
            if pad:
                c = jnp.pad(c, [(0, 0), (0, pad)] + [(0, 0)] * (c.ndim - 2))
            out = self._jit_forward_sp(self.params,
                                       shard_time(c, self.sp_mesh))
            if pad:
                out = out[:, : (out.shape[1] * t) // c.shape[1]]
            return out
        return self._jit_forward(self.params, c, ar)

    def remove_weight_norm(self) -> None:
        """Fold (g, v) weight-norm params (reference API parity; outputs are
        numerically identical — see utils/weight_norm.py)."""
        from articulatory_tpu.utils.weight_norm import fold_weight_norm

        self.params = fold_weight_norm(jax.device_get(self.params))
        for cached in ("_jit_forward", "_jit_forward_sp", "_ar_scan_cache"):
            self.__dict__.pop(cached, None)  # drop cached jit closures

    def inference(self, c: np.ndarray, normalize_before: bool = False,
                  bucket_frames: int | None = None) -> np.ndarray:
        """(T, in_feats) -> (T * prod(scales), out_channels), full utterance.

        ``bucket_frames``: pad T up to the next multiple before the forward
        so arbitrary utterance lengths reuse a small set of compiled
        executables (each unique length otherwise costs a fresh XLA compile).
        The output is trimmed back to the exact length; only the last
        receptive-field window can differ marginally from exact-length
        inference.
        """
        c = jnp.asarray(c)
        if not jnp.issubdtype(c.dtype, jnp.integer):
            c = c.astype(jnp.float32)  # int inputs = phoneme ids (embeddings)
        if normalize_before:
            c = self.normalize(c)
        t = c.shape[0]
        if bucket_frames:
            pad = (-t) % bucket_frames
            if pad:
                c = jnp.pad(c, [(0, pad)] + [(0, 0)] * (c.ndim - 1))
        out = self(c[None])
        # multiband synthesis under the train-side gate (reference
        # train.py:281: out_channels > 1 AND pqmf enabled) — a w2a model
        # with multi-channel *feature* output must not be PQMF-synthesized
        if self.pqmf is not None and self.config.get("pqmf", False):
            out = self.pqmf.synthesis(out)
        out = np.asarray(out[0])
        if bucket_frames:
            # exact rational length trim — works for upsampling (a2w,
            # out_len = T*prod(scales)) and downsampling (w2a inversion,
            # out_len = T/hop) alike
            out = out[: out.shape[0] * t // c.shape[0]]
        return out


def _load_stats(stats: str) -> tuple[np.ndarray, np.ndarray]:
    if stats.endswith(".h5"):
        mean = read_hdf5(stats, "mean").reshape(-1)
        scale = read_hdf5(stats, "scale").reshape(-1)
    else:
        arr = np.load(stats)
        mean = arr[0].reshape(-1)
        scale = arr[1].reshape(-1)
    return mean, scale


def load_model(checkpoint: str, config: dict | str | None = None,
               stats: str | None = None, generator2: bool = False) -> LoadedModel:
    """Rebuild a generator from config.yml + checkpoint (ours or torch)."""
    if generator2:
        type_key, params_key, generator_key = ("generator2_type",
                                               "generator2_params", "generator2")
    else:
        type_key, params_key, generator_key = ("generator_type",
                                               "generator_params", "generator")
    if config is None:
        config = os.path.join(os.path.dirname(checkpoint), "config.yml")
    if isinstance(config, str):
        config = load_config(config)

    gen_type = config.get(type_key, "ParallelWaveGANGenerator")
    gen_params = fix_generator_params(config[params_key])
    model = build_model(gen_type,
                        inject_time_packing(gen_type, gen_params, config))

    params, mutables = _load_generator_params(checkpoint, generator_key,
                                              gen_type, gen_params)

    # stats beside the checkpoint (reference utils.py:345-356)
    if stats is None:
        dirname = os.path.dirname(checkpoint)
        ext = "h5" if config.get("format", "hdf5") == "hdf5" else "npy"
        candidate = os.path.join(dirname, f"stats.{ext}")
        if os.path.exists(candidate):
            stats = candidate
    mean = scale = None
    if stats is not None:
        mean, scale = _load_stats(stats)

    pqmf = None
    if config[params_key].get("out_channels", 1) > 1:
        pqmf_params = config.get("pqmf_params", {})
        pqmf = PQMF(subbands=config[params_key]["out_channels"], **pqmf_params)

    # move params to device once — otherwise every jitted call re-uploads the
    # full host-resident weight pytree
    params = jax.tree.map(jnp.asarray, params)
    mutables = jax.tree.map(jnp.asarray, mutables)

    loaded = LoadedModel(model=model, params=params, config=config,
                         mutables=mutables, mean=mean, scale=scale, pqmf=pqmf)
    if config.get("weight_quant") == "int8":
        loaded.quantize_int8()
    elif config.get("weight_quant"):
        raise ValueError(f"unsupported weight_quant: {config['weight_quant']} "
                         "(only 'int8' is implemented)")
    return loaded


def _load_generator_params(checkpoint: str, generator_key: str,
                           gen_type: str, gen_params: dict):
    """Load generator params from our msgpack checkpoint or a torch pickle."""
    with open(checkpoint, "rb") as f:
        head = f.read(2)
    if head == b"PK" or checkpoint.endswith((".pkl", ".pth", ".pt")):
        try:
            from articulatory_tpu.utils.checkpoint import load_checkpoint

            payload = load_checkpoint(checkpoint)
            sd = payload["model"][generator_key]
            return sd, payload.get("mutables", {}).get(generator_key, {}) or {}
        except Exception:
            pass
        # torch pickle path: convert layouts
        from articulatory_tpu.utils.torch_import import (
            GENERATOR_IMPORTERS,
            load_torch_checkpoint,
        )

        ckpt = load_torch_checkpoint(checkpoint)
        sd = ckpt["model"][generator_key]
        if isinstance(sd, tuple):  # reference generator2 save quirk (train.py:165)
            sd = sd[0]
        if gen_type not in GENERATOR_IMPORTERS:
            raise NotImplementedError(
                f"torch checkpoint import not implemented for {gen_type}")
        return GENERATOR_IMPORTERS[gen_type](sd, gen_params)
    from articulatory_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(checkpoint)
    sd = payload["model"][generator_key]
    return sd, payload.get("mutables", {}).get(generator_key, {}) or {}


# ---------------------------------------------------------------------------
# chunked autoregressive decode (HiFi-CAR)
# ---------------------------------------------------------------------------

def ar_loop(model: LoadedModel, x: np.ndarray, config: dict,
            do_wsola: bool = False, modality: int | None = None,
            generator2: bool = False):
    """Chunked AR decode (reference decode.py:31-100).

    Args:
        model: loaded generator (callable (1, T, C), ar=(1, P, C_out)).
        x: input sequence (T, num_feats) — features for a2w, waveform for w2a.
        config: experiment config dict.

    Returns:
        a2w: waveform (T_out,); w2a: features (T', C); wsola: (chunk list, ins).
    """
    params_key = "generator2_params" if generator2 else "generator_params"
    w2a = (not generator2) and config.get("dataset_mode") == "w2a"
    audio_chunk_len = config["batch_max_steps"]
    gp = config[params_key]
    out_channels = gp.get("out_channels", 1)
    if w2a:
        in_chunk_len = audio_chunk_len
        past_out_len = int(gp.get("ar_input", 512) / out_channels)
    else:
        in_chunk_len = int(audio_chunk_len / config["hop_size"])
        past_out_len = gp.get("ar_input", 512)

    x = np.asarray(x)
    # f64 preserved for jax_enable_x64 parity decodes (cotrain_parity.py);
    # everything else (incl. int phoneme ids) computes in f32 as usual
    x = x if x.dtype == np.float64 else x.astype(np.float32)
    if x.ndim == 1:
        x = x[:, None]

    if modality is not None:
        # multimodal decode (reference decode.py:52-53, 67-71): interpolate
        # the chunk to the common frame rate and place it in the per-modality
        # input list expected by in_list generators
        scale_factor = (config["sampling_rate"] / config["hop_size"]
                        * config["hop_sizes"][modality]
                        / config["sampling_rates"][modality])
        n_modalities = len(gp["in_list"])

    if not do_wsola:
        ins = [x[i:i + in_chunk_len] for i in range(0, len(x), in_chunk_len)]
        if w2a and len(ins[-1]) < config["hop_size"]:
            ins = ins[:-1]
        prev = jnp.zeros((1, past_out_len, out_channels), x.dtype)
        outs = []  # device-resident; one host sync at the end keeps the
        # chunk pipeline full instead of a transfer round-trip per chunk
        for cin in ins:
            if modality is not None:
                interp = interpolate_linear_scale(jnp.asarray(cin)[None],
                                                  scale_factor)
                cin_list = [None] * n_modalities
                cin_list[modality] = interp
                cout = model(cin_list, ar=prev)
                outs.append(cout[0])
                # same shift-register update as the non-modality branch
                # (reference decode.py:77-81 applies it to modality chunks too)
                if past_out_len <= audio_chunk_len:
                    prev = cout[:, -past_out_len:, :]
                else:
                    prev = jnp.concatenate(
                        [prev[:, cout.shape[1]:, :], cout], axis=1)
                continue
            cout = model(jnp.asarray(cin)[None], ar=prev)  # (1, T_out, C_out)
            outs.append(cout[0])
            if past_out_len <= audio_chunk_len:
                prev = cout[:, -past_out_len:, :]
            else:
                prev = jnp.concatenate(
                    [prev[:, len(cin) if w2a else cout.shape[1]:, :], cout], axis=1)
        out = np.concatenate([np.asarray(o) for o in outs], axis=0)  # (T_out, C)
        return out if w2a else out[:, 0] if out.shape[1] == 1 else out
    else:
        extra_art = config[params_key].get("extra_art", False)
        assert in_chunk_len % 2 == 0
        step = int(in_chunk_len / 2)
        ins = [x[i:i + in_chunk_len + int(bool(extra_art))]
               for i in range(0, len(x), step)]
        prev = jnp.zeros((1, past_out_len, 1), jnp.float32)
        outs = []
        for art_i, art in enumerate(ins):
            signal = model(jnp.asarray(art)[None], ar=prev)  # (1, T, 1)
            outs.append(np.asarray(signal[0, :, 0]))
            if art_i < len(ins) - 1:
                lo = int(audio_chunk_len / 2) - past_out_len
                hi = int(audio_chunk_len / 2)
                prev = signal[:, lo:hi, :]
                assert prev.shape[1] == past_out_len
        return outs, ins


def ar_loop_batched(model: LoadedModel, xs: list[np.ndarray], config: dict,
                    scan: bool = False) -> list[np.ndarray]:
    """Throughput-mode chunked AR decode over a batch of utterances.

    Covers both directions (a2w wave decode and w2a inversion, like
    ``ar_loop_scan``). Each utterance keeps its own AR carry; inputs are
    padded to a common chunk count and outputs trimmed to each utterance's
    true length (w2a: after the reference's sub-hop tail drop,
    decode.py:57-58). Batched decoding is how the 50x-per-chip realtime
    target is exceeded by orders of magnitude (see bench.py);
    per-utterance outputs can differ from the sequential ar_loop only in
    the final partial chunk's tail (zero padding vs a shorter input — for
    zero-'same'-padded conv generators even that is exact; the w2a
    bidirectional recurrences see the pad, use ``ar_loop_scan`` per
    utterance when exact tails matter).

    ``scan=True`` computes the SAME lane semantics as ONE ``lax.scan``
    dispatch instead of one dispatch per chunk: the whole padded lane
    batch uploads once and the AR chunk chain runs device-side. Through
    a tunneled/remote device this removes the per-chunk transfer+dispatch
    roundtrip that otherwise dominates served AR throughput (see
    benchmarks/inversion_bench.py --ar lane metrics).
    """
    gp = config["generator_params"]
    hop = config["hop_size"]
    audio_chunk_len = config["batch_max_steps"]
    w2a = config.get("dataset_mode") == "w2a"
    out_channels = gp.get("out_channels", 1)
    if w2a:
        in_chunk_len = audio_chunk_len
        past_out_len = int(gp.get("ar_input", 512) / out_channels)
    else:
        in_chunk_len = audio_chunk_len // hop
        past_out_len = gp.get("ar_input", 512)
    # reference decode.py:77: the carry regime compares past_out_len against
    # the SAMPLE chunk length in both directions
    last_window = past_out_len <= audio_chunk_len

    b = len(xs)
    feat_dim = xs[0].shape[1] if xs[0].ndim == 2 else 1
    lengths = [len(x) for x in xs]
    if w2a:
        # reference decode.py:57-58: drop each utterance's sub-hop tail
        lengths = [t - rem if 0 < (rem := t % in_chunk_len) < hop else t
                   for t in lengths]
    n_chunks = max(-(-t // in_chunk_len) for t in lengths)
    if n_chunks == 0:
        # every lane's (tail-dropped) input is empty; the reference crashes
        # here (np.concatenate over zero chunks, decode.py:82) — return
        # well-formed empty outputs instead
        return [np.zeros((0, out_channels), np.float32) if w2a
                else (np.zeros((0,), np.float32) if out_channels == 1
                      else np.zeros((0, out_channels), np.float32))
                for _ in xs]
    batch = np.zeros((b, n_chunks * in_chunk_len, feat_dim), np.float32)
    for i, x in enumerate(xs):
        x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[:, None]
        batch[i, : lengths[i]] = x[: lengths[i]]

    if scan:
        chunks = jnp.asarray(
            batch.reshape(b, n_chunks, in_chunk_len, feat_dim)
            .swapaxes(0, 1))  # (n_chunks, B, T, C)
        run = _get_scan_fn(model, past_out_len, out_channels, last_window,
                           w2a=w2a)
        wav = np.asarray(run(model.params, chunks))  # (B, n*T_out, C)
    else:
        prev = jnp.zeros((b, past_out_len, out_channels), jnp.float32)
        outs = []
        for ci in range(n_chunks):
            cin = jnp.asarray(
                batch[:, ci * in_chunk_len:(ci + 1) * in_chunk_len])
            cout = model(cin, ar=prev)
            outs.append(cout)
            if last_window:
                prev = cout[:, -past_out_len:, :]
            else:
                # shift register (reference decode.py:79-81): the AR window
                # spans several chunks — slide left by one chunk's output
                prev = jnp.concatenate(
                    [prev[:, (in_chunk_len if w2a else cout.shape[1]):, :],
                     cout], axis=1)
        wav = np.concatenate([np.asarray(o) for o in outs], axis=1)
    if w2a:
        # per-chunk output length is model-defined (T->T for the
        # BiGRU/Transformer inversion models); scale each trim accordingly
        fpc = wav.shape[1] // n_chunks
        return [wav[i, : lengths[i] * fpc // in_chunk_len]
                for i in range(b)]
    return [wav[i, : lengths[i] * hop, 0] if out_channels == 1
            else wav[i, : lengths[i] * hop] for i in range(b)]


def _get_scan_fn(model, past_out_len: int, out_channels: int,
                 last_window: bool, w2a: bool = False):
    """One jitted scan body per (model, carry signature).

    Cached on the model object so repeated calls (decode CLI over a corpus,
    a serving loop) reuse the same jit closure — jax.jit then handles
    per-chunk-shape executables internally, and the persistent compilation
    cache makes those one-time costs survive process restarts.

    ``last_window`` picks the AR-carry regime, decided by the caller from
    the reference's condition ``past_out_len <= batch_max_steps``
    (decode.py:77 — note the comparison is against the SAMPLE chunk length
    even in the w2a direction, where ``past_out_len`` counts frames).
    ``w2a`` picks the shift-register slide amount: input rows in the w2a
    direction, output length otherwise (reference decode.py:79-81 —
    ``len(cin) if w2a else out.shape[1]``, same rule as the host loops).
    """
    try:
        cache = model.__dict__.setdefault("_ar_scan_cache", {})
    except AttributeError:  # exotic shims without __dict__
        cache = {}
    key = (past_out_len, out_channels, last_window, w2a)
    if key in cache:
        return cache[key]

    @jax.jit
    def run(params, chunks):
        if getattr(model, "quantized", False):
            from articulatory_tpu.utils.quantize import dequantize_params

            # loop-invariant: XLA hoists the dequant out of the scan, so
            # HBM holds int8 weights and the loop reads the one dequantized
            # copy from its working set
            params = dequantize_params(params)

        # rank decides lane count at trace time: (n, T, C) is the
        # single-utterance scan, (n, B, T, C) runs B AR lanes per step
        # (ar_loop_batched's lane semantics in one dispatch)
        batched = chunks.ndim == 4

        def body(prev, cin):
            out = model.model.apply({"params": params, **model.mutables},
                                    cin if batched else cin[None], ar=prev)
            if isinstance(out, tuple):
                out = out[0]
            if last_window:
                new_prev = out[:, -past_out_len:, :]
            else:
                # shift register (reference decode.py:79-81): the AR window
                # spans several chunks — slide the old window left by one
                # chunk (input rows in w2a, output length in a2w, matching
                # the host loops) and append the new chunk's output
                shift = cin.shape[-2] if w2a else out.shape[1]
                new_prev = jnp.concatenate([prev[:, shift:, :], out],
                                           axis=1)
            return new_prev, out if batched else out[0]

        lanes = chunks.shape[1] if batched else 1
        prev0 = jnp.zeros((lanes, past_out_len, out_channels), jnp.float32)
        _, outs = jax.lax.scan(body, prev0, chunks)
        if batched:  # (n, B, T_out, C) -> (B, n*T_out, C)
            return outs.swapaxes(0, 1).reshape(lanes, -1, outs.shape[-1])
        return outs.reshape(-1, outs.shape[-1])

    cache[key] = run
    return run


def ar_loop_scan(model: LoadedModel, x: np.ndarray, config: dict,
                 chunk_bucket: int = 0) -> np.ndarray:
    """Fully-compiled AR decode: pad to whole chunks and lax.scan over them.

    Matches ``ar_loop`` in BOTH directions — a2w (features -> waveform) and
    w2a (features -> articulatory trajectories, reference decode.py:44-51) —
    and in both AR-carry regimes (last-window and the shift-register case
    ``ar_input > batch_max_steps``). a2w ragged tails are computed under
    zero padding and trimmed, which is EXACTLY the short-chunk forward for
    the zero-'same'-padded conv generators; w2a ragged tails (where padding
    would leak through the bidirectional recurrence) run as one extra
    exact-shape forward seeded with the scan's carry.
    Preferred for serving/benchmarking: ONE device dispatch per utterance
    instead of one per chunk, which removes the per-chunk dispatch+sync
    roundtrip that dominates single-stream latency (reference serial loop:
    decode.py:31-100).

    ``chunk_bucket``: round the chunk count up to this multiple so arbitrary
    utterance lengths share a small set of compiled executables (same idea
    as ``LoadedModel.inference(bucket_frames=...)``); the padded tail is
    computed and discarded. 0 = exact chunk count.
    """
    gp = config["generator_params"]
    hop = config["hop_size"]
    audio_chunk_len = config["batch_max_steps"]
    w2a = config.get("dataset_mode") == "w2a"
    out_channels = gp.get("out_channels", 1)
    if w2a:
        # reference decode.py:46-48: chunk the input rows directly; the AR
        # carry counts FRAMES (ar_input flattened elements / out_channels)
        in_chunk_len = audio_chunk_len
        past_out_len = int(gp.get("ar_input", 512) / out_channels)
    else:
        in_chunk_len = audio_chunk_len // hop
        past_out_len = gp.get("ar_input", 512)
    # reference decode.py:77 compares against the SAMPLE chunk length in
    # both directions
    last_window = past_out_len <= audio_chunk_len

    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    t = len(x)
    rem = t % in_chunk_len
    if w2a:
        if 0 < rem < hop:
            # reference decode.py:57-58 drops a trailing sub-hop w2a chunk
            t -= rem
            rem = 0
        full = t // in_chunk_len
        n_chunks = full
        if chunk_bucket and full:
            n_chunks = -(-full // chunk_bucket) * chunk_bucket
        out = np.zeros((0, out_channels), np.float32)
        if full:
            xp = np.pad(x[: full * in_chunk_len],
                        ((0, (n_chunks - full) * in_chunk_len), (0, 0)))
            chunks = jnp.asarray(xp.reshape(n_chunks, in_chunk_len,
                                            x.shape[1]))
            run = _get_scan_fn(model, past_out_len, out_channels,
                               last_window, w2a=True)
            scanned = np.asarray(run(model.params, chunks))
            out = scanned[: full * (scanned.shape[0] // n_chunks)]
        if rem:
            # exact ragged tail: the host loop's short-chunk forward,
            # seeded with the scan's carry. In BOTH regimes the carry
            # entering the tail equals the last past_out_len output frames
            # (zero-prefixed when fewer exist) — reference decode.py:77-81
            # maintains exactly that invariant — so it is recoverable from
            # the outputs without threading it out of the scan.
            buf = np.concatenate(
                [np.zeros((past_out_len, out_channels), np.float32), out])
            cout = model(jnp.asarray(x[full * in_chunk_len: t])[None],
                         ar=jnp.asarray(buf[-past_out_len:])[None])
            if isinstance(cout, tuple):
                cout = cout[0]
            out = np.concatenate([out, np.asarray(cout[0], np.float32)])
        return out
    n_chunks = max(-(-t // in_chunk_len), 1)
    if chunk_bucket:
        n_chunks = -(-n_chunks // chunk_bucket) * chunk_bucket
    pad = n_chunks * in_chunk_len - t
    xp = np.pad(x[:t], ((0, pad), (0, 0)))
    chunks = jnp.asarray(xp.reshape(n_chunks, in_chunk_len, x.shape[1]))

    run = _get_scan_fn(model, past_out_len, out_channels, last_window)
    out = np.asarray(run(model.params, chunks))
    return out[: t * hop, 0] if out.shape[1] == 1 else out[: t * hop]
