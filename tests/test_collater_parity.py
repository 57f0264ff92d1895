"""SpeechCollater parity vs the reference collater (all package modes)."""

import numpy as np
import pytest

from conftest import requires_reference


class _NpRandomShim:
    """Adapter so our collater draws the same ints as np.random.randint."""

    def integers(self, lo, hi):
        return np.random.randint(lo, hi)


def _batch(rng, n=3, hop=80):
    items = []
    for i in range(n):
        t = 4000 + 400 * i
        items.append({
            "audio": rng.standard_normal(t).astype(np.float32),
            "art": rng.standard_normal((t // hop + 5, 13)).astype(np.float32),
        })
    return items


def _config(package_mode, use_ar=True, w2a=False):
    return {
        "batch_max_steps": 800, "hop_size": 80,
        "package_mode": package_mode,
        "generator_params": {"out_channels": 12 if w2a else 1,
                             "use_ar": use_ar, "ar_input": 96},
    }


@requires_reference
@pytest.mark.parametrize("mode,dataset_mode", [
    ("random_window", "a2w"),
    ("random_window", "w2a"),
    ("pad", "a2w"),
])
def test_speech_collater_matches_reference(reference, rng, mode, dataset_mode):
    import torch
    from articulatory.bin.train import SpeechCollater as RefCollater

    from articulatory_tpu.data.collate import SpeechCollater

    config = _config(mode, use_ar=(mode == "random_window"),
                     w2a=(dataset_mode == "w2a"))
    config["dataset_mode"] = dataset_mode

    items = _batch(rng)
    ref = RefCollater(batch_max_steps=800, hop_size=80, aux_context_window=0,
                      dataset_mode=dataset_mode, config=config)
    ours = SpeechCollater(batch_max_steps=800, hop_size=80,
                          aux_context_window=0, dataset_mode=dataset_mode,
                          config=config, rng=_NpRandomShim())

    np.random.seed(123)
    ref_out = ref(items)
    np.random.seed(123)
    our_out = ours(items)

    # y: reference (B, C, T) / (B, 1, T); ours (B, T, C)
    y_ref = ref_out["y"].numpy()
    y_ours = np.transpose(our_out["y"], (0, 2, 1))
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-6)

    x_ref = ref_out["x"][0].numpy()
    x_ours = np.transpose(our_out["x"][0], (0, 2, 1))
    np.testing.assert_allclose(x_ours, x_ref, rtol=1e-6)

    if "ar" in ref_out and ref_out.get("ar") is not None:
        ar_ref = ref_out["ar"].numpy()
        ar_ours = np.transpose(our_out["ar"], (0, 2, 1))
        np.testing.assert_allclose(ar_ours, ar_ref, rtol=1e-6)


@requires_reference
def test_window_mode_reference_is_broken_ours_works(reference, rng):
    """The reference's 'window' package mode crashes (train.py:1002 uses
    self.device which is never assigned); ours implements the documented
    concat-then-reshape semantics."""
    import pytest as _pytest
    from articulatory.bin.train import SpeechCollater as RefCollater

    from articulatory_tpu.data.collate import SpeechCollater

    config = _config("window", use_ar=False)
    config["dataset_mode"] = "a2w"
    items = _batch(rng)
    ref = RefCollater(batch_max_steps=800, hop_size=80, aux_context_window=0,
                      dataset_mode="a2w", config=config)
    with _pytest.raises(AttributeError):
        ref(items)

    ours = SpeechCollater(batch_max_steps=800, hop_size=80,
                          aux_context_window=0, dataset_mode="a2w",
                          config=config, rng=_NpRandomShim())
    out = ours(items)
    n = out["y"].shape[0]
    assert out["y"].shape == (n, 800, 1)
    assert out["x"][0].shape == (n, 10, 13)
    # windows are the concatenation of the truncated per-utterance streams
    cat_audio = np.concatenate(
        [it["audio"][: (len(it["audio"]) // 80) * 80] for it in items])
    flat = out["y"][..., 0].reshape(-1)
    np.testing.assert_allclose(flat[: len(cat_audio)], cat_audio, rtol=1e-6)
