"""Batched AR decode: per-utterance outputs match the sequential ar_loop on
all complete chunks."""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.inference import ar_loop, ar_loop_batched
from articulatory_tpu.models import HiFiGANGenerator


class _Shim:
    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.mutables = {}

    @functools.cached_property
    def _jit(self):
        return jax.jit(lambda p, c, ar: self.model.apply(
            {"params": p, **self.mutables}, c, ar=ar))

    def __call__(self, c, ar=None):
        return self._jit(self.params, c, ar)


def test_batched_matches_sequential(rng):
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    c0 = jnp.zeros((1, 10, 13))
    v = model.init(jax.random.PRNGKey(0), c0, ar=jnp.zeros((1, 64, 1)))
    shim = _Shim(model, v["params"])

    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    # lengths that are whole numbers of 10-frame chunks (exact-match regime)
    xs = [rng.standard_normal((30, 13)).astype(np.float32),
          rng.standard_normal((20, 13)).astype(np.float32),
          rng.standard_normal((30, 13)).astype(np.float32)]

    batched = ar_loop_batched(shim, xs, config)
    for x, yb in zip(xs, batched):
        y_seq = np.asarray(ar_loop(shim, x, config))
        assert yb.shape == y_seq.shape
        np.testing.assert_allclose(yb, y_seq, rtol=1e-4, atol=1e-5)


def test_scan_matches_sequential(rng):
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    c0 = jnp.zeros((1, 10, 13))
    v = model.init(jax.random.PRNGKey(0), c0, ar=jnp.zeros((1, 64, 1)))
    shim = _Shim(model, v["params"])

    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    from articulatory_tpu.inference import ar_loop_scan

    for t in (30, 27):  # whole chunks and a ragged tail
        x = rng.standard_normal((t, 13)).astype(np.float32)
        y_scan = ar_loop_scan(shim, x, config)
        y_seq = np.asarray(ar_loop(shim, x, config))
        n_full = (t // 10) * 800
        assert len(y_scan) == t * 80
        np.testing.assert_allclose(y_scan[:n_full], y_seq[:n_full],
                                   rtol=1e-4, atol=1e-5)


def test_scan_shift_register_matches_sequential(rng):
    """ar_input > batch_max_steps: the scan carry must slide like the
    reference's multi-chunk shift register (decode.py:79-81)."""
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=2000, ar_hidden=8,
        ar_output=8)
    c0 = jnp.zeros((1, 10, 13))
    v = model.init(jax.random.PRNGKey(0), c0, ar=jnp.zeros((1, 2000, 1)))
    shim = _Shim(model, v["params"])

    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 2000}}
    from articulatory_tpu.inference import ar_loop_scan

    x = rng.standard_normal((50, 13)).astype(np.float32)  # 5 full chunks
    y_scan = ar_loop_scan(shim, x, config)
    y_seq = np.asarray(ar_loop(shim, x, config))
    assert y_scan.shape == y_seq.shape
    np.testing.assert_allclose(y_scan, y_seq, rtol=1e-4, atol=1e-5)


def test_scan_w2a_matches_sequential(rng):
    """w2a direction: frame-rate features -> trajectories via BiGRU; the
    scan must reproduce ar_loop's chunking, feature-domain AR carry, and
    the reference's trailing sub-hop chunk drop (decode.py:46-48, 57-58)."""
    from articulatory_tpu.inference import ar_loop_scan
    from articulatory_tpu.models import BiGRU

    out_ch, ar_input = 4, 16  # past_out_len = 4 frames
    model = BiGRU(in_channels=5 + 8, hidden_size=8, out_channels=out_ch,
                  use_ar=True, ar_input=ar_input, ar_hidden=8, ar_output=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 5)),
                   ar=jnp.zeros((1, ar_input // out_ch, out_ch)))
    shim = _Shim(model, v["params"])
    shim.mutables = {k: val for k, val in v.items() if k != "params"}

    config = {"dataset_mode": "w2a", "batch_max_steps": 100, "hop_size": 80,
              "generator_params": {"out_channels": out_ch, "use_ar": True,
                                   "ar_input": ar_input}}
    # full chunks; ragged tail >= hop (kept — computed EXACTLY via the
    # seeded short-chunk forward, since zero padding would leak through the
    # bidirectional recurrence); ragged tail < hop (dropped, reference
    # decode.py:57-58); shorter-than-one-chunk utterance (pure tail)
    for t, ref_len in ((300, 300), (290, 290), (250, 200), (90, 90)):
        x = rng.standard_normal((t, 5)).astype(np.float32)
        y_scan = np.asarray(ar_loop_scan(shim, x, config))
        y_seq = np.asarray(ar_loop(shim, x, config))
        assert len(y_seq) == ref_len and len(y_scan) == ref_len
        assert y_scan.shape[1] == out_ch
        np.testing.assert_allclose(y_scan, y_seq, rtol=1e-4, atol=1e-5)


def test_scan_chunk_bucket_identical(rng):
    """Bucketing the chunk count only pads discarded tail chunks — the
    retained output must be bit-identical to the exact-count scan."""
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    c0 = jnp.zeros((1, 10, 13))
    v = model.init(jax.random.PRNGKey(0), c0, ar=jnp.zeros((1, 64, 1)))
    shim = _Shim(model, v["params"])
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    from articulatory_tpu.inference import ar_loop_scan

    x = rng.standard_normal((27, 13)).astype(np.float32)
    exact = ar_loop_scan(shim, x, config, chunk_bucket=0)
    bucketed = ar_loop_scan(shim, x, config, chunk_bucket=4)
    np.testing.assert_array_equal(exact, bucketed)


def test_batched_scan_matches_batched_loop_a2w(rng):
    """scan=True runs the SAME lane semantics as the per-chunk host loop
    in one lax.scan dispatch — outputs must agree chunk for chunk."""
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    c0 = jnp.zeros((1, 10, 13))
    v = model.init(jax.random.PRNGKey(0), c0, ar=jnp.zeros((1, 64, 1)))
    shim = _Shim(model, v["params"])

    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    # mixed lengths incl. a ragged tail (27): both paths zero-pad the same
    # lane batch, so outputs match on FULL lengths, not just full chunks
    xs = [rng.standard_normal((t, 13)).astype(np.float32)
          for t in (30, 20, 27)]
    loop = ar_loop_batched(shim, xs, config)
    scan = ar_loop_batched(shim, xs, config, scan=True)
    for yl, ys in zip(loop, scan):
        assert yl.shape == ys.shape
        np.testing.assert_allclose(ys, yl, rtol=1e-4, atol=1e-5)
    # and the sequential oracle on the whole-chunk prefixes
    for x, ys in zip(xs, scan):
        seq = np.asarray(ar_loop(shim, x, config))
        n_full = (len(x) // 10) * 800
        np.testing.assert_allclose(ys[:n_full], seq[:n_full],
                                   rtol=1e-4, atol=1e-5)


def test_batched_scan_matches_batched_loop_w2a(rng):
    """w2a lanes via one scan dispatch: per-lane AR carries, per-utterance
    sub-hop drops, and trims equal the host-loop lane path."""
    from articulatory_tpu.models import BiGRU

    out_ch, ar_input = 4, 16
    model = BiGRU(in_channels=5 + 8, hidden_size=8, out_channels=out_ch,
                  use_ar=True, ar_input=ar_input, ar_hidden=8, ar_output=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 5)),
                   ar=jnp.zeros((1, ar_input // out_ch, out_ch)))
    shim = _Shim(model, v["params"])
    shim.mutables = {k: val for k, val in v.items() if k != "params"}

    config = {"dataset_mode": "w2a", "batch_max_steps": 100, "hop_size": 80,
              "generator_params": {"out_channels": out_ch, "use_ar": True,
                                   "ar_input": ar_input}}
    cases = ((300, 300), (290, 290), (250, 200), (90, 90))
    xs = [rng.standard_normal((t, 5)).astype(np.float32) for t, _ in cases]
    loop = ar_loop_batched(shim, xs, config)
    scan = ar_loop_batched(shim, xs, config, scan=True)
    for (t, ref_len), yl, ys in zip(cases, loop, scan):
        assert len(yl) == ref_len and len(ys) == ref_len
        np.testing.assert_allclose(ys, yl, rtol=1e-4, atol=1e-5)


def test_batched_w2a_lanes_match_sequential(rng):
    """w2a batched lanes: mixed-length inversion group vs per-utterance
    ar_loop — exact lengths (incl. the per-utterance sub-hop drop,
    reference decode.py:57-58) and full-chunk prefix equality (ragged
    tails are zero-padded in lane mode; the bidirectional GRU sees the
    pad, so only complete chunks compare exactly)."""
    from articulatory_tpu.inference import ar_loop_batched
    from articulatory_tpu.models import BiGRU

    out_ch, ar_input = 4, 16
    model = BiGRU(in_channels=5 + 8, hidden_size=8, out_channels=out_ch,
                  use_ar=True, ar_input=ar_input, ar_hidden=8, ar_output=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 5)),
                   ar=jnp.zeros((1, ar_input // out_ch, out_ch)))
    shim = _Shim(model, v["params"])
    shim.mutables = {k: val for k, val in v.items() if k != "params"}

    config = {"dataset_mode": "w2a", "batch_max_steps": 100, "hop_size": 80,
              "generator_params": {"out_channels": out_ch, "use_ar": True,
                                   "ar_input": ar_input}}
    # (input rows, expected output frames after the sub-hop drop)
    cases = ((300, 300), (290, 290), (250, 200), (90, 90))
    xs = [rng.standard_normal((t, 5)).astype(np.float32) for t, _ in cases]
    outs = ar_loop_batched(shim, xs, config)
    for x, out, (t, ref_len) in zip(xs, outs, cases):
        seq = np.asarray(ar_loop(shim, x, config))
        assert len(seq) == ref_len and len(out) == ref_len
        full = (ref_len // 100) * 100
        np.testing.assert_allclose(out[:full], seq[:full],
                                   rtol=1e-4, atol=1e-5)


def test_batched_shift_register_matches_sequential(rng):
    """ar_input > batch_max_steps routed through the batched path (ADVICE
    r4: used to die on a bare assert) — both the per-chunk host loop and
    the one-dispatch scan must slide the multi-chunk shift register like
    the sequential loop (reference decode.py:79-81)."""
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=2000, ar_hidden=8,
        ar_output=8)
    c0 = jnp.zeros((1, 10, 13))
    v = model.init(jax.random.PRNGKey(0), c0, ar=jnp.zeros((1, 2000, 1)))
    shim = _Shim(model, v["params"])

    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 2000}}
    xs = [rng.standard_normal((t, 13)).astype(np.float32)
          for t in (50, 40, 50)]  # whole 10-frame chunks
    for scan in (False, True):
        outs = ar_loop_batched(shim, xs, config, scan=scan)
        for x, out in zip(xs, outs):
            seq = np.asarray(ar_loop(shim, x, config))
            assert out.shape == seq.shape
            np.testing.assert_allclose(out, seq, rtol=1e-4, atol=1e-5)


def test_batched_all_empty_inputs(rng):
    """Degenerate all-empty lane group (ADVICE r4: used to raise
    ZeroDivisionError / np.concatenate error): well-formed empty outputs."""
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    c0 = jnp.zeros((1, 10, 13))
    v = model.init(jax.random.PRNGKey(0), c0, ar=jnp.zeros((1, 64, 1)))
    shim = _Shim(model, v["params"])

    a2w = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
           "generator_params": {"out_channels": 1, "use_ar": True,
                                "ar_input": 64}}
    xs = [np.zeros((0, 13), np.float32)] * 2
    outs = ar_loop_batched(shim, xs, a2w)
    assert len(outs) == 2 and all(o.shape == (0,) for o in outs)

    # w2a: inputs shorter than hop_size drop to length 0 via the sub-hop
    # tail rule; outputs must be empty (0, out_channels) arrays
    w2a = {"dataset_mode": "w2a", "batch_max_steps": 100, "hop_size": 80,
           "generator_params": {"out_channels": 4, "use_ar": True,
                                "ar_input": 16}}
    xs = [np.zeros((0, 5), np.float32),
          rng.standard_normal((50, 5)).astype(np.float32)]
    outs = ar_loop_batched(shim, xs, w2a)
    assert len(outs) == 2 and all(o.shape == (0, 4) for o in outs)
