"""Native C++ batcher: correctness vs the Python collater semantics."""

import os
import subprocess

import numpy as np
import pytest


def _ensure_built():
    from articulatory_tpu.data import native_loader

    if native_loader.is_available():
        return True
    root = os.path.join(os.path.dirname(__file__), "..")
    try:
        subprocess.run(["cmake", "-S", os.path.join(root, "native"), "-B",
                        os.path.join(root, "native", "build")],
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", os.path.join(root, "native", "build")],
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return native_loader.is_available()


pytestmark = pytest.mark.skipif(not _ensure_built(),
                                reason="native toolchain unavailable")


def test_native_collate_matches_source(tmp_path, rng):
    from articulatory_tpu.data.native_loader import NativeBatcher

    hop, steps, ar_len = 80, 800, 64
    b = NativeBatcher(batch_max_steps=steps, hop_size=hop, ar_len=ar_len,
                      n_threads=2)
    audios, arts = [], []
    for i in range(3):
        t = 4000 + 400 * i
        audio = rng.standard_normal(t).astype(np.float32)
        art = rng.standard_normal((t // hop + 7, 13)).astype(np.float32)
        ap = str(tmp_path / f"a{i}.npy")
        fp = str(tmp_path / f"f{i}.npy")
        np.save(ap, audio)
        np.save(fp, art)
        b.add_utterance(ap, fp)
        audios.append(audio)
        arts.append(art)

    assert len(b) == 3
    assert b.art_dim == 13
    # art truncated to len(audio)/hop
    assert b.utt_frames(0) == 4000 // hop

    batch = b.collate([0, 1, 2], seed=42)
    assert batch["y"].shape == (3, steps, 1)
    assert batch["x"][0].shape == (3, steps // hop, 13)
    assert batch["ar"].shape == (3, ar_len, 1)

    # every crop must be a contiguous slice of the source at a frame boundary
    for i in range(3):
        wav_crop = batch["y"][i, :, 0]
        # locate the crop in the source
        src = audios[i]
        # search over frame-aligned starts
        found = False
        for sf in range((len(src) - steps) // hop + 1):
            s = sf * hop
            if np.array_equal(src[s:s + steps], wav_crop):
                found = True
                art_crop = batch["x"][0][i]
                np.testing.assert_array_equal(arts[i][sf:sf + steps // hop],
                                              art_crop)
                # AR context = preceding ar_len samples, zero-padded at start
                expected_ar = np.zeros(ar_len, np.float32)
                avail = min(s, ar_len)
                if avail:
                    expected_ar[ar_len - avail:] = src[s - avail:s]
                np.testing.assert_array_equal(expected_ar, batch["ar"][i, :, 0])
                break
        assert found, f"crop {i} is not a frame-aligned slice of its source"

    # determinism given the same seed; variation across seeds
    batch2 = b.collate([0, 1, 2], seed=42)
    np.testing.assert_array_equal(batch["y"], batch2["y"])
    batch3 = b.collate([0, 1, 2], seed=43)
    assert not np.array_equal(batch["y"], batch3["y"])


def test_native_f8_npy(tmp_path, rng):
    from articulatory_tpu.data.native_loader import NativeBatcher

    b = NativeBatcher(batch_max_steps=400, hop_size=80, ar_len=0, n_threads=1)
    audio = rng.standard_normal(2000).astype(np.float64)
    art = rng.standard_normal((25, 4)).astype(np.float64)
    ap, fp = str(tmp_path / "a.npy"), str(tmp_path / "f.npy")
    np.save(ap, audio)
    np.save(fp, art)
    b.add_utterance(ap, fp)
    batch = b.collate([0], seed=0)
    assert np.all(np.isfinite(batch["y"]))
