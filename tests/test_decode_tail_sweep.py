"""Tail-robustness sweep across the decode variants.

Every throughput/latency path (scan, scan+bucket, batched lanes) must agree
with the plain sequential ``ar_loop`` on all complete chunks for ragged
utterance lengths, and the WSOLA contract must hold under the same model
(reference behavior: decode.py:84-100).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from articulatory_tpu.inference import (
    ar_loop,
    ar_loop_batched,
    ar_loop_scan,
)
from articulatory_tpu.models import HiFiGANGenerator

CHUNK_FRAMES = 10  # batch_max_steps 800 / hop 80

CONFIG = {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
          "generator_params": {"out_channels": 1, "use_ar": True,
                               "ar_input": 64, "extra_art": False}}


class _Shim:
    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.mutables = {}

    @functools.cached_property
    def _jit(self):
        return jax.jit(lambda p, c, ar: self.model.apply({"params": p}, c, ar=ar))

    def __call__(self, c, ar=None):
        return self._jit(self.params, c, ar)


@pytest.fixture(scope="module")
def shim():
    model = HiFiGANGenerator(
        in_channels=13 + 8, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),), use_ar=True, ar_input=64, ar_hidden=8,
        ar_output=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, CHUNK_FRAMES, 13)),
                   ar=jnp.zeros((1, 64, 1)))
    return _Shim(model, v["params"])


LENGTHS = [30, 27, 13, 10, 3]  # whole, ragged, short, exact-one, sub-chunk


@pytest.mark.parametrize("t", LENGTHS)
@pytest.mark.parametrize("bucket", [0, 4])
def test_scan_tail(shim, rng, t, bucket):
    x = rng.standard_normal((t, 13)).astype(np.float32)
    y_scan = ar_loop_scan(shim, x, CONFIG, chunk_bucket=bucket)
    y_seq = np.asarray(ar_loop(shim, x, CONFIG))
    assert len(y_scan) == t * 80
    n_full = (t // CHUNK_FRAMES) * 800
    np.testing.assert_allclose(y_scan[:n_full], y_seq[:n_full],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("lanes", [2, 3])
@pytest.mark.parametrize("scan", [False, True])
def test_batched_lane_tails(shim, rng, lanes, scan):
    """Ragged lengths across lanes: each lane's output is trimmed to its own
    true length and matches the sequential decode on full chunks — via the
    per-chunk host loop AND the one-dispatch lane scan."""
    xs = [rng.standard_normal((t, 13)).astype(np.float32)
          for t in LENGTHS[:lanes]]
    ys = ar_loop_batched(shim, xs, CONFIG, scan=scan)
    for x, yb in zip(xs, ys):
        assert len(yb) == len(x) * 80
        y_seq = np.asarray(ar_loop(shim, x, CONFIG))
        n_full = (len(x) // CHUNK_FRAMES) * 800
        np.testing.assert_allclose(yb[:n_full], y_seq[:n_full],
                                   rtol=1e-4, atol=1e-5)


def test_wsola_chunk_contract(shim, rng):
    """WSOLA mode returns 50%-overlap chunk lists (reference decode.py:84-100):
    len(ins) = ceil(T / (chunk/2)) windows, each output chunk one full
    forward of its window; deterministic across calls."""
    x = rng.standard_normal((30, 13)).astype(np.float32)
    signals, ins = ar_loop(shim, x, CONFIG, do_wsola=True)
    assert len(signals) == len(ins) == 6  # step = chunk_frames/2 = 5
    for sig, art in zip(signals, ins):
        assert len(sig) == len(art) * 80
    signals2, _ = ar_loop(shim, x, CONFIG, do_wsola=True)
    for a, b in zip(signals, signals2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
