"""dataset_mode parsing parity — incl. the shipped mri mode string.

The mri recipe's real mode is ``tracks_npy_minc_punc2wav_adobe_0p9_punc``
(reference egs/mri/voc1/conf/mri2w_hifigan_car.yaml:27), parsed by the
generic split-on-'2' branch (reference train.py:957-963). In the reference,
the resulting x/y keys are not keys the collater's batch dict contains, so
training crashes with KeyError at train.py:1069 and decode refuses the mode
at decode.py:266. We pin (a) the raw split parity, (b) that quirk, and
(c) our resolution: generic modes collate exactly like 'a2w' and decode as
wave output, so the shipped config works verbatim.
"""

import numpy as np
import pytest

from conftest import requires_reference

from articulatory_tpu.data.collate import (
    SpeechCollater,
    is_wave_output_mode,
    parse_dataset_mode,
)

MRI_MODE = "tracks_npy_minc_punc2wav_adobe_0p9_punc"

# every named mode the collater supports + the shipped configs' generic one
NAMED_MODES = ["a2w", "w2a", "ph2a", "ph2m", "m2w"]


@pytest.mark.parametrize("mode", NAMED_MODES)
def test_named_mode_keys_match_reference_table(mode):
    """Our named-mode table mirrors reference train.py:927-956 exactly."""
    expected = {
        "a2w": ("art", "audio", True, False, True),
        "w2a": ("audio", "art", True, False, True),
        "ph2a": ("ph", "art", False, False, True),
        "ph2m": ("ph", "mel", False, True, False),
        "m2w": ("mel", "audio", True, True, False),
    }[mode]
    assert parse_dataset_mode(mode) == expected


def test_generic_mri_mode_splits_like_reference_then_resolves():
    """split('2') gives the same raw x/y as reference train.py:958-960; the
    raw names are then resolved onto the streams the branch loads."""
    xy = MRI_MODE.split("2")
    assert xy == ["tracks_npy_minc_punc", "wav_adobe_0p9_punc"]
    x_key, y_key, use_audio, use_mel, use_art = parse_dataset_mode(MRI_MODE)
    assert (x_key, y_key) == ("art", "audio")
    assert (use_audio, use_mel, use_art) == (True, False, True)


@requires_reference
@pytest.mark.parametrize("mode", NAMED_MODES + [MRI_MODE])
def test_mode_keys_parity_vs_reference_collater(mode, reference):
    """Instantiate the REFERENCE SpeechCollater on every mode and compare
    raw x/y keys; for generic modes ours resolves the (reference-crashing)
    raw names onto produced streams."""
    from articulatory.bin.train import SpeechCollater as RefCollater

    config = {"batch_max_steps": 800, "hop_size": 80,
              "generator_params": {"out_channels": 1, "use_ar": False}}
    ref = RefCollater(batch_max_steps=800, hop_size=80, dataset_mode=mode,
                      config=config)
    x_key, y_key, use_audio, use_mel, use_art = parse_dataset_mode(mode)
    assert (use_audio, use_mel, use_art) == (
        ref.use_audio, ref.use_mel, ref.use_art)
    if mode in NAMED_MODES:
        assert (x_key, y_key) == (ref.x_key, ref.y_key)
    else:
        # the reference's raw keys are not batch keys -> its collate call
        # KeyErrors (train.py:1069); ours resolves them to art/audio
        assert ref.x_key == "tracks_npy_minc_punc"
        assert ref.y_key == "wav_adobe_0p9_punc"
        assert (x_key, y_key) == ("art", "audio")


@requires_reference
def test_reference_crashes_on_mri_mode_we_do_not(reference):
    """Executable proof of the quirk: the reference collater KeyErrors on the
    shipped mri mode string; ours returns a well-formed batch."""
    from articulatory.bin.train import SpeechCollater as RefCollater

    rng = np.random.default_rng(0)
    items = []
    for i in range(2):
        t = 4000 + 400 * i
        items.append({
            "audio": rng.standard_normal(t).astype(np.float32),
            "art": rng.standard_normal((t // 80 + 5, 13)).astype(np.float32),
        })
    config = {"batch_max_steps": 800, "hop_size": 80,
              "package_mode": "random_window",
              "generator_params": {"out_channels": 1, "use_ar": False}}
    ref = RefCollater(batch_max_steps=800, hop_size=80,
                      dataset_mode=MRI_MODE, config=config)
    with pytest.raises(KeyError):
        ref(items)
    ours = SpeechCollater(batch_max_steps=800, hop_size=80,
                          dataset_mode=MRI_MODE, config=config)
    batch = ours(items)
    assert batch["x"][0].shape == (2, 10, 13)
    assert batch["y"].shape == (2, 800, 1)


def test_generic_mode_collates_identically_to_a2w():
    """Same RNG stream -> the mri mode's batch is bit-identical to a2w."""

    class _FixedRng:
        def __init__(self):
            self._r = np.random.default_rng(7)

        def integers(self, lo, hi):
            return self._r.integers(lo, hi)

    rng = np.random.default_rng(1)
    items = []
    for i in range(3):
        t = 4000 + 400 * i
        items.append({
            "audio": rng.standard_normal(t).astype(np.float32),
            "art": rng.standard_normal((t // 80 + 5, 13)).astype(np.float32),
        })
    config = {"batch_max_steps": 800, "hop_size": 80,
              "package_mode": "random_window",
              "generator_params": {"out_channels": 1, "use_ar": True,
                                   "ar_input": 96}}
    out_a2w = SpeechCollater(batch_max_steps=800, hop_size=80,
                             dataset_mode="a2w", config=config,
                             rng=_FixedRng())(items)
    out_mri = SpeechCollater(batch_max_steps=800, hop_size=80,
                             dataset_mode=MRI_MODE, config=config,
                             rng=_FixedRng())(items)
    assert set(out_a2w) == set(out_mri)
    for k in out_a2w:
        if k == "x":
            np.testing.assert_array_equal(out_a2w["x"][0], out_mri["x"][0])
        else:
            np.testing.assert_array_equal(out_a2w[k], out_mri[k])


def test_wave_output_mode_dispatch():
    """Decode output-type dispatch: generic x2y modes are wave modes (the
    reference instead raises at decode.py:266); inversion modes are not."""
    for m in ("default", "a2w", "a2w_pcd", "a2w_mult", "m2w", MRI_MODE):
        assert is_wave_output_mode(m), m
    for m in ("w2a", "ph2a", "ph2m", "a2m", "m2a", "art"):
        assert not is_wave_output_mode(m), m


def test_default_mode_resolves_to_a2w():
    """A config that omits dataset_mode reaches the collater as 'default'
    (train.py); it must resolve to a2w semantics rather than crash
    (regression: bare IndexError on the 1-element split('2'); the
    reference IndexErrors identically at train.py:958)."""
    assert parse_dataset_mode("default") == parse_dataset_mode("a2w")
    c = SpeechCollater(batch_max_steps=800, hop_size=80,
                       dataset_mode="default")
    assert (c.x_key, c.y_key) == ("art", "audio")


def test_two_less_generic_mode_resolves_with_warning(caplog):
    """Any other '2'-less mode string resolves to a2w semantics with a
    warning instead of an unexplained IndexError."""
    import logging as _logging

    with caplog.at_level(_logging.WARNING):
        assert parse_dataset_mode("artwave") == parse_dataset_mode("a2w")
    assert any("no '2' separator" in r.message for r in caplog.records)


def test_decode_only_modes_refused_for_training():
    """a2w_mult / a2w_pcd are decode-side mode names (reference
    decode.py:229,254); training them through SpeechCollater must fail
    actionably rather than silently train plain-a2w semantics (the
    reference KeyErrors on the split('2') keys, train.py:1069)."""
    for m in ("a2w_mult", "a2w_pcd"):
        with pytest.raises(ValueError, match="decode-only"):
            parse_dataset_mode(m)
        assert is_wave_output_mode(m)  # the decode dispatch still takes them
