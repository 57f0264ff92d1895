"""Device-resident corpus cache: the jitted on-device crop must reproduce
the host collater's batches exactly for identical (utt, start) draws —
including the AR context windows' zero padding at sequence start."""

import numpy as np
import pytest

from articulatory_tpu.data.collate import CollaterMelArt, SpeechCollater
from articulatory_tpu.data.device_cache import DeviceCachedBatcher

HOP = 80
FRAMES = 25  # batch_max_steps 2000 / hop 80


class _ListDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class _FixedStartRng:
    """np.random.Generator stand-in that returns prescribed window starts."""

    def __init__(self, starts):
        self.starts = list(starts)

    def integers(self, lo, hi):
        s = self.starts.pop(0)
        assert lo <= s < hi
        return s


def _corpus(rng, n=5, dict_items=True):
    items = []
    for i in range(n):
        frames = rng.integers(60, 120)
        art = rng.standard_normal((frames + 7, 13)).astype(np.float32)
        audio = rng.standard_normal(frames * HOP).astype(np.float32)
        items.append({"audio": audio, "art": art})
    return items


@pytest.mark.parametrize("mode,ar", [("a2w", False), ("a2w", True),
                                     ("w2a", True)])
def test_matches_host_collater(mode, ar, rng):
    items = _corpus(rng)
    config = {
        "dataset_mode": mode, "hop_size": HOP,
        "batch_max_steps": FRAMES * HOP,
        "generator_params": {"out_channels": 1 if mode == "a2w" else 13,
                             "use_ar": ar, "ar_input": 512},
    }
    batcher = DeviceCachedBatcher(_ListDataset(items), config, batch_size=3,
                                  seed=0)
    utts = np.array([0, 2, 4], np.int32)
    starts = np.array([0, 5, 30], np.int32)  # include start=0 (AR zero pad)
    dev = {k: (np.asarray(v[0]),) if k == "x" else np.asarray(v)
           for k, v in batcher.batch_at(utts, starts).items()}

    collater = SpeechCollater(
        batch_max_steps=FRAMES * HOP, hop_size=HOP, dataset_mode=mode,
        config=config, rng=_FixedStartRng(list(starts)))
    host = collater([items[u] for u in utts])

    np.testing.assert_allclose(dev["x"][0], host["x"][0], atol=0)
    np.testing.assert_allclose(dev["y"], host["y"], atol=0)
    if ar:
        np.testing.assert_allclose(dev["ar"], host["ar"], atol=0)
    else:
        assert "ar" not in dev


def test_matches_melart_collater(rng):
    items = []
    for i in range(4):
        frames = int(rng.integers(60, 120))
        mel = rng.standard_normal((frames, 20)).astype(np.float32)
        art = rng.standard_normal((frames, 13)).astype(np.float32)
        items.append((mel, art))
    config = {"dataset_mode": "m2a", "hop_size": HOP,
              "batch_max_steps": FRAMES * HOP, "generator_params": {}}
    batcher = DeviceCachedBatcher(_ListDataset(items), config, batch_size=2,
                                  seed=0)
    utts = np.array([1, 3], np.int32)
    starts = np.array([4, 11], np.int32)
    dev = batcher.batch_at(utts, starts)

    collater = CollaterMelArt(batch_max_steps=FRAMES * HOP, hop_size=HOP,
                              aux_context_window=0, dataset_mode="m2a",
                              rng=_FixedStartRng(list(starts)))
    host = collater([items[u] for u in utts])
    np.testing.assert_allclose(np.asarray(dev["x"][0]), host["x"][0], atol=0)
    np.testing.assert_allclose(np.asarray(dev["y"]), host["y"], atol=0)


def test_iteration_and_bounds(rng):
    items = _corpus(rng, n=6)
    config = {"dataset_mode": "a2w", "hop_size": HOP,
              "batch_max_steps": FRAMES * HOP,
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 512}}
    batcher = DeviceCachedBatcher(_ListDataset(items), config, batch_size=4,
                                  seed=3)
    n = 0
    for batch in batcher:
        assert batch["x"][0].shape == (4, FRAMES, 13)
        assert batch["y"].shape == (4, FRAMES * HOP, 1)
        assert batch["ar"].shape == (4, 512, 1)
        n += 1
    assert n == len(batcher)
    # different epochs draw different windows
    batcher.set_epoch(1)
    b0 = next(iter(batcher))
    batcher.set_epoch(2)
    b1 = next(iter(batcher))
    assert not np.allclose(np.asarray(b0["y"]), np.asarray(b1["y"]))


def test_sample_start_range_matches_host(rng):
    """Starts must lie in [0, len - frames - 1] — the host collater's
    exclusive-high rng.integers range (collate.py), not one past it."""
    items = _corpus(rng, n=4)
    config = {"dataset_mode": "a2w", "hop_size": HOP,
              "batch_max_steps": FRAMES * HOP,
              "generator_params": {"out_channels": 1, "use_ar": False}}
    batcher = DeviceCachedBatcher(_ListDataset(items), config, batch_size=64,
                                  seed=0)
    g = np.random.default_rng(0)
    for _ in range(50):
        utts, starts = batcher.sample_indices(g)
        highs = batcher.lengths[utts] - batcher.frames
        assert np.all(starts < highs), "start == len - frames sampled"
        assert np.all(starts >= 0)


def test_rejects_unsupported_configs(rng):
    items = _corpus(rng, n=3)
    base = {"dataset_mode": "a2w", "hop_size": HOP,
            "batch_max_steps": FRAMES * HOP,
            "generator_params": {"out_channels": 1, "use_ar": False}}
    cfg = dict(base, generator2_type="HiFiGANGenerator")
    with pytest.raises(ValueError, match="generator2"):
        DeviceCachedBatcher(_ListDataset(items), cfg, batch_size=2)
    cfg = dict(base)
    cfg["generator_params"] = dict(base["generator_params"],
                                   aux_context_window=2)
    with pytest.raises(ValueError, match="aux_context_window"):
        DeviceCachedBatcher(_ListDataset(items), cfg, batch_size=2)
    cfg = dict(base, use_pcd=True)
    with pytest.raises(ValueError, match="PCD"):
        DeviceCachedBatcher(_ListDataset(items), cfg, batch_size=2)


MRI_MODE = "tracks_npy_minc_punc2wav_adobe_0p9_punc"  # mri2w_hifigan_car.yaml:27


def test_canonical_cache_mode():
    """Generic x2y modes resolve to the cache's canonical modes exactly like
    the training collater resolves their streams (collate.parse_dataset_mode);
    unsupported stream pairs return None."""
    from articulatory_tpu.data.device_cache import canonical_cache_mode

    for mode in ("a2w", "w2a", "a2m", "m2a"):
        assert canonical_cache_mode(mode) == mode
    assert canonical_cache_mode(MRI_MODE) == "a2w"  # shipped mri config
    assert canonical_cache_mode("default") == "a2w"
    assert canonical_cache_mode("ph2a") is None    # ph stream not cached
    assert canonical_cache_mode("m2w") is None     # mel+audio pair not cached
    assert canonical_cache_mode("a2w_mult") is None
    assert canonical_cache_mode("a2w_pcd") is None


def test_mri_mode_rides_cache_via_canonical_mode(rng):
    """The shipped mri dataset_mode trains through the device cache: the
    canonicalized batcher reproduces the host collater's batches for the
    VERBATIM mri mode string (which resolves to a2w semantics)."""
    from articulatory_tpu.data.device_cache import canonical_cache_mode

    items = _corpus(rng)
    config = {
        "dataset_mode": MRI_MODE, "hop_size": HOP,
        "batch_max_steps": FRAMES * HOP,
        "generator_params": {"out_channels": 1, "use_ar": True,
                             "ar_input": 512},
    }
    canon = canonical_cache_mode(config["dataset_mode"])
    batcher = DeviceCachedBatcher(
        _ListDataset(items), {**config, "dataset_mode": canon},
        batch_size=3, seed=0)
    utts = np.array([0, 2, 4], np.int32)
    starts = np.array([0, 5, 30], np.int32)
    dev = {k: (np.asarray(v[0]),) if k == "x" else np.asarray(v)
           for k, v in batcher.batch_at(utts, starts).items()}

    collater = SpeechCollater(
        batch_max_steps=FRAMES * HOP, hop_size=HOP, dataset_mode=MRI_MODE,
        config=config, rng=_FixedStartRng(list(starts)))
    host = collater([items[u] for u in utts])
    np.testing.assert_allclose(dev["x"][0], host["x"][0], atol=0)
    np.testing.assert_allclose(dev["y"], host["y"], atol=0)
    np.testing.assert_allclose(dev["ar"], host["ar"], atol=0)
