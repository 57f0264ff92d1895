"""Streaming synthesizer: chunk-stream output equals the offline ar_loop."""

import numpy as np

import jax
import jax.numpy as jnp

from articulatory_tpu.inference import LoadedModel, ar_loop
from articulatory_tpu.models import HiFiGANGenerator
from articulatory_tpu.streaming import StreamingSynthesizer


def test_streaming_matches_ar_loop(rng):
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 64, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})

    x = rng.standard_normal((30, 13)).astype(np.float32)  # 3 full chunks
    offline = np.asarray(ar_loop(model, x, config))

    stream = StreamingSynthesizer(model, config)
    chunks = list(stream.synthesize(x))
    streamed = np.concatenate([c[:, 0] for c in chunks])
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)

    # reset gives a fresh stream identical to the first
    stream.reset()
    chunks2 = list(stream.synthesize(x))
    np.testing.assert_array_equal(np.concatenate([c[:, 0] for c in chunks2]),
                                  streamed)


def test_streaming_shift_register_matches_ar_loop(rng):
    """ar_input > batch_max_steps: the streaming carry slides across chunks
    like the reference's shift register (decode.py:79-81)."""
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 2000}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=2000, ar_hidden=8,
        ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 2000, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})

    x = rng.standard_normal((50, 13)).astype(np.float32)  # 5 full chunks
    offline = np.asarray(ar_loop(model, x, config))
    stream = StreamingSynthesizer(model, config)
    streamed = np.concatenate([c[:, 0] for c in stream.synthesize(x)])
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_synthesize_all_matches_chunked(rng):
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 64, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})
    stream = StreamingSynthesizer(model, config)

    x = rng.standard_normal((27, 13)).astype(np.float32)  # ragged tail
    chunked = np.concatenate([c[:, 0] for c in stream.synthesize(x)])
    stream.reset()
    whole = stream.synthesize_all(x)
    assert whole.shape == chunked.shape
    # full chunks match exactly; the padded tail chunk sees zero-padding in
    # both paths, so it matches too
    np.testing.assert_allclose(whole, chunked, rtol=1e-4, atol=1e-5)


def test_streaming_pipeline_depths_identical(rng):
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 64}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, 64, 1)))
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={})
    stream = StreamingSynthesizer(model, config)
    x = rng.standard_normal((30, 13)).astype(np.float32)
    d1 = np.concatenate([c[:, 0] for c in stream.synthesize(x, pipeline_depth=1)])
    stream.reset()
    d4 = np.concatenate([c[:, 0] for c in stream.synthesize(x, pipeline_depth=4)])
    np.testing.assert_array_equal(d1, d4)


def _bigru_w2a(rng, out_ch=4, ar_input=16, chunk=100):
    from articulatory_tpu.models import BiGRU

    model_def = BiGRU(in_channels=5 + 8, hidden_size=8, out_channels=out_ch,
                      use_ar=True, ar_input=ar_input, ar_hidden=8,
                      ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 5)),
                       ar=jnp.zeros((1, ar_input // out_ch, out_ch)))
    config = {"dataset_mode": "w2a", "batch_max_steps": chunk, "hop_size": 80,
              "generator_params": {"out_channels": out_ch, "use_ar": True,
                                   "ar_input": ar_input}}
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={k: x for k, x in v.items()
                                  if k != "params"})
    return model, config


def test_streaming_w2a_matches_ar_loop(rng):
    """Inversion streaming (dataset_mode: w2a): per-chunk trajectory output
    equals the offline ar_loop on complete chunks, with the reference's
    ragged-tail semantics — a >= hop remainder is kept (computed under zero
    padding, so only the full-chunk prefix compares exactly against the
    host loop's dynamic-shape tail), a sub-hop remainder is dropped
    (reference decode.py:57-58)."""
    model, config = _bigru_w2a(rng)

    # (input rows, expected output frames, exactly-matching prefix)
    for t, ref_len, full in ((300, 300, 300), (290, 290, 200), (250, 200, 200)):
        x = rng.standard_normal((t, 5)).astype(np.float32)
        offline = np.asarray(ar_loop(model, x, config))
        assert offline.shape == (ref_len, 4)
        stream = StreamingSynthesizer(model, config)
        streamed = np.concatenate(list(stream.synthesize(x)))
        assert streamed.shape == offline.shape
        np.testing.assert_allclose(streamed[:full], offline[:full],
                                   rtol=1e-4, atol=1e-5)

    # synthesize_all rides ar_loop_scan's w2a path; full-chunk stream is
    # identical to the chunked stream
    x = rng.standard_normal((300, 5)).astype(np.float32)
    stream = StreamingSynthesizer(model, config)
    chunked = np.concatenate(list(stream.synthesize(x)))
    stream.reset()
    whole = np.asarray(stream.synthesize_all(x))
    assert whole.shape == chunked.shape
    np.testing.assert_allclose(whole, chunked, rtol=1e-4, atol=1e-5)


def test_streaming_w2a_shift_register_matches_ar_loop(rng):
    """w2a with ar carry spanning several chunks (past frames > chunk rows,
    compared against the SAMPLE chunk length as in reference decode.py:77):
    the streaming carry slides like the offline shift register."""
    model, config = _bigru_w2a(rng, out_ch=2, ar_input=300)  # 150 > 100

    x = rng.standard_normal((500, 5)).astype(np.float32)  # 5 full chunks
    offline = np.asarray(ar_loop(model, x, config))
    stream = StreamingSynthesizer(model, config)
    assert stream.shift_register
    streamed = np.concatenate(list(stream.synthesize(x)))
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def _hifigan_a2w(rng, ar_input=64):
    config = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": ar_input}}
    model_def = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=ar_input,
        ar_hidden=8, ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)),
                       ar=jnp.zeros((1, ar_input, 1)))
    return LoadedModel(model=model_def, params=v["params"], config=config,
                       mutables={}), config


def test_server_churn_bit_identical(rng):
    """Continuous batching (VERDICT r4 #3): streams joining/leaving/stalling
    mid-serve produce BIT-IDENTICAL output to a fresh solo decode of the
    same stream through the same server geometry."""
    from articulatory_tpu.streaming import StreamingServer

    model, config = _hifigan_a2w(rng)
    streams = {c: rng.standard_normal((n * 10, 13)).astype(np.float32)
               for c, n in (("a", 6), ("b", 4), ("c", 2))}

    # churn scenario: a joins at round 0; b joins at round 2; a leaves after
    # round 5 (6 chunks); c joins round 6 REUSING a's freed lane; b stalls
    # in round 4 (keeps carry) and finishes late
    server = StreamingServer(model, config, max_lanes=2)
    got = {c: [] for c in streams}
    chunk = lambda c, i: streams[c][i * 10:(i + 1) * 10]
    plan = [  # (round, submissions) — b skips round 4
        {"a": 0}, {"a": 1}, {"a": 2, "b": 0}, {"a": 3, "b": 1},
        {"a": 4}, {"a": 5, "b": 2}, {"c": 0, "b": 3}, {"c": 1},
    ]
    server.join("a")
    for rnd, subs in enumerate(plan):
        if rnd == 2:
            server.join("b")
        if rnd == 6:
            server.leave("a")
            assert server.join("c") == 0  # reuses a's freed lane slot
        outs = server.step({c: chunk(c, i) for c, i in subs.items()})
        for c, y in outs.items():
            got[c].append(y)

    for c, x in streams.items():
        mine = np.concatenate(got[c])[:, 0]
        # fresh solo serve in the SAME geometry -> bit-identical
        solo_srv = StreamingServer(model, config, max_lanes=2)
        solo_srv.join("solo")
        solo = np.concatenate(
            [solo_srv.step({"solo": x[i:i + 10]})["solo"]
             for i in range(0, len(x), 10)])[:, 0]
        np.testing.assert_array_equal(mine, solo)
        # and equals the offline ar_loop within float tolerance
        offline = np.asarray(ar_loop(model, x, config))
        np.testing.assert_allclose(mine, offline, rtol=1e-4, atol=1e-5)


def test_server_partial_tail_and_errors(rng):
    from articulatory_tpu.streaming import StreamingServer

    model, config = _hifigan_a2w(rng)
    server = StreamingServer(model, config, max_lanes=2)
    x = rng.standard_normal((17, 13)).astype(np.float32)
    server.join("a")
    y0 = server.step({"a": x[:10]})["a"]
    y1 = server.step({"a": x[10:]})["a"]  # 7-frame tail -> 560 samples
    assert y0.shape == (800, 1) and y1.shape == (560, 1)
    mine = np.concatenate([y0, y1])[:, 0]
    offline = np.asarray(ar_loop(model, x, config))
    n_full = 800  # the padded tail matches the solo zero-pad contract
    np.testing.assert_allclose(mine[:n_full], offline[:n_full],
                               rtol=1e-4, atol=1e-5)

    import pytest
    with pytest.raises(ValueError):
        server.join("a")           # double join
    with pytest.raises(KeyError):
        server.step({"zz": x[:10]})  # not joined
    server.join("b")
    with pytest.raises(RuntimeError):
        server.join("overflow")    # full
    server.leave("b")
    server.join("d")               # slot reuse after leave


def test_server_w2a_churn_matches_solo(rng):
    """Inversion-direction server lanes under churn == solo serve."""
    from articulatory_tpu.streaming import StreamingServer

    model, config = _bigru_w2a(rng)
    xa = rng.standard_normal((300, 5)).astype(np.float32)
    xb = rng.standard_normal((200, 5)).astype(np.float32)
    server = StreamingServer(model, config, max_lanes=3)
    server.join("a")
    got_a = [server.step({"a": xa[:100]})["a"]]
    server.join("b")
    outs = server.step({"a": xa[100:200], "b": xb[:100]})
    got_a.append(outs["a"])
    got_b = [outs["b"]]
    outs = server.step({"a": xa[200:], "b": xb[100:]})
    got_a.append(outs["a"])
    got_b.append(outs["b"])
    for cid, x, got in (("a", xa, got_a), ("b", xb, got_b)):
        solo_srv = StreamingServer(model, config, max_lanes=3)
        solo_srv.join("s")
        solo = np.concatenate(
            [solo_srv.step({"s": x[i:i + 100]})["s"]
             for i in range(0, len(x), 100)])
        np.testing.assert_array_equal(np.concatenate(got), solo)


def test_server_shift_register_churn_matches_solo(rng):
    """Server lanes in the shift-register regime (ar_input >
    batch_max_steps): the masked carry update must slide the multi-chunk
    window per lane, under churn, identically to a solo serve."""
    from articulatory_tpu.streaming import StreamingServer

    model, config = _hifigan_a2w(rng, ar_input=2000)
    xa = rng.standard_normal((50, 13)).astype(np.float32)
    xb = rng.standard_normal((30, 13)).astype(np.float32)
    server = StreamingServer(model, config, max_lanes=2)
    assert server.syn.shift_register
    server.join("a")
    got_a = [server.step({"a": xa[:10]})["a"]]
    got_b = []
    server.join("b")
    for i in range(1, 5):
        subs = {"a": xa[i * 10:(i + 1) * 10]}
        if (i - 1) * 10 < len(xb):
            subs["b"] = xb[(i - 1) * 10:i * 10]
        outs = server.step(subs)
        got_a.append(outs["a"])
        if "b" in outs:
            got_b.append(outs["b"])
    for cid, x, got in (("a", xa, got_a), ("b", xb, got_b)):
        solo = StreamingServer(model, config, max_lanes=2)
        solo.join("s")
        want = np.concatenate(
            [solo.step({"s": x[i:i + 10]})["s"]
             for i in range(0, len(x), 10)])
        np.testing.assert_array_equal(np.concatenate(got), want)
    # and the offline oracle within float tolerance
    offline = np.asarray(ar_loop(model, xa, config))
    np.testing.assert_allclose(np.concatenate(got_a)[:, 0], offline,
                               rtol=1e-4, atol=1e-5)


def test_server_1d_chunks_match_2d(rng):
    """Raw 1-D chunks (the w2a serving input form) must normalize to
    (t, 1) BEFORE the lane batch's feature dim is derived — a 1-D chunk
    used to set feat_dim to the chunk LENGTH (code-review r5 finding)."""
    from articulatory_tpu.models import BiGRU
    from articulatory_tpu.streaming import StreamingServer

    out_ch, ar_input = 4, 16
    model_def = BiGRU(in_channels=1 + 8, hidden_size=8, out_channels=out_ch,
                      use_ar=True, ar_input=ar_input, ar_hidden=8,
                      ar_output=8)
    v = model_def.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 1)),
                       ar=jnp.zeros((1, ar_input // out_ch, out_ch)))
    config = {"dataset_mode": "w2a", "batch_max_steps": 100, "hop_size": 80,
              "generator_params": {"out_channels": out_ch, "use_ar": True,
                                   "ar_input": ar_input}}
    model = LoadedModel(model=model_def, params=v["params"], config=config,
                        mutables={k: x for k, x in v.items()
                                  if k != "params"})
    wav = rng.standard_normal(200).astype(np.float32)
    srv1 = StreamingServer(model, config, max_lanes=2)
    srv1.join("a")
    one_d = np.concatenate([srv1.step({"a": wav[i:i + 100]})["a"]
                            for i in (0, 100)])
    srv2 = StreamingServer(model, config, max_lanes=2)
    srv2.join("a")
    two_d = np.concatenate([srv2.step({"a": wav[i:i + 100, None]})["a"]
                            for i in (0, 100)])
    np.testing.assert_array_equal(one_d, two_d)
    assert one_d.shape == (200 * 1, out_ch) or one_d.shape[1] == out_ch
