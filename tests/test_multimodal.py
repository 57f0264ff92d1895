"""Multi-modality data components (reference audio_mel_dataset.py:534-666,
train.py:1101-1224, scp_dataset.py:441-525).

Note: the reference *imports* WavArtMultDataset in bin/train.py but never
instantiates it (its dataset selection at train.py:1543-1602 only has the
MelArt and Speech branches), so the mult collater is exercised here as a
library component; only ArtSCPMultDataset is reachable from a CLI (decode
a2w_mult).
"""

import os

import numpy as np

from articulatory_tpu.data.multimodal import (
    ArtSCPMultDataset,
    SpeechCollaterMult,
    WavArtMultDataset,
)
from articulatory_tpu.utils.io import write_hdf5


def test_speech_collater_mult_shapes(rng):
    # two modalities: EMA-like (hop 80 @ 16k) and MRI-like (hop 240 @ 20k)
    coll = SpeechCollaterMult(
        batch_max_steps=800, hop_size=80, ar_len=64,
        hop_sizes=[80, 240], sampling_rate=16000,
        sampling_rates=[16000, 20000], rng=rng)
    batch = [
        (rng.standard_normal(4000).astype(np.float32),
         rng.standard_normal((50, 8)).astype(np.float32), 0),
        (rng.standard_normal(4005).astype(np.float32),
         rng.standard_normal((21, 12)).astype(np.float32), 1),
        (rng.standard_normal(4800).astype(np.float32),
         rng.standard_normal((60, 8)).astype(np.float32), 0),
    ]
    out = coll(batch)
    (x_list,) = out["x"]
    assert len(x_list) == 2
    assert x_list[0].shape == (2, 10, 8)   # two EMA items, 10 frames
    assert x_list[1].shape == (1, 10, 12)  # one MRI item
    assert out["y"].shape == (3, 800, 1)
    assert out["ar"].shape == (3, 64, 1)


def test_speech_collater_mult_absent_modality(rng):
    coll = SpeechCollaterMult(
        batch_max_steps=800, hop_size=80, hop_sizes=[80, 240],
        sampling_rate=16000, sampling_rates=[16000, 20000], rng=rng)
    batch = [(rng.standard_normal(4000).astype(np.float32),
              rng.standard_normal((50, 8)).astype(np.float32), 0)]
    (x_list,) = coll(batch)["x"]
    assert x_list[1] is None  # absent modality -> None (reference :1196-1207)


def test_wav_art_mult_dataset(tmp_path, rng):
    os.chdir(tmp_path)
    roots = []
    for mod, (stage, sr, n_art) in enumerate(
            [("ema_train", 16000, 8), ("mri_train", 20000, 12)]):
        dump = tmp_path / "dump" / stage / "norm"
        data = tmp_path / "data" / stage
        data.mkdir(parents=True)
        lines = []
        for u in range(2):
            fid = f"{stage}_utt{u}"
            write_hdf5(str(dump / f"{fid}.h5"), "wave",
                       rng.standard_normal(sr // 4).astype(np.float32))
            artp = data / f"{fid}.npy"
            np.save(artp, rng.standard_normal((50, n_art)).astype(np.float32))
            lines.append(f"{fid} {artp}")
        (data / "feats.scp").write_text("\n".join(lines) + "\n")
        roots.append(str(dump))

    ds = WavArtMultDataset(roots, sampling_rate=16000,
                           sampling_rates=[16000, 20000],
                           data_root=str(tmp_path / "data"))
    assert len(ds) == 4
    a0, art0, m0 = ds[0]
    a2, art2, m2 = ds[2]
    assert (m0, m2) == (0, 1)
    assert len(a0) == 4000                # native rate, no resample
    assert len(a2) == 4000                # 20k/4 resampled to 16k
    assert art0.shape[1] == 8 and art2.shape[1] == 12


def test_art_scp_mult_dataset(tmp_path, rng):
    p0 = tmp_path / "u0.npy"
    p1 = tmp_path / "u1.npy"
    np.save(p0, rng.standard_normal((30, 8)).astype(np.float32))
    np.save(p1, rng.standard_normal((40, 12)).astype(np.float32))
    scp = tmp_path / "feats.scp"
    scp.write_text(f"u0 {p0} 0\nu1 {p1} 1\n")
    ds = ArtSCPMultDataset(str(scp), return_utt_id=True)
    assert len(ds) == 2
    uid, art, mod = ds[1]
    assert uid == "u1" and art.shape == (40, 12) and mod == 1


def test_ar_loop_modality_shift_register(rng):
    """a2w_mult decode with ar_input > chunk: the modality branch must apply
    the same shift-register AR update as the non-modality branch (reference
    decode.py:77-81) — before the fix `prev` stayed all-zeros forever."""
    import jax.numpy as jnp

    from articulatory_tpu.inference import ar_loop

    hop, chunk = 4, 16  # 4-frame input chunks -> 16 output samples
    seen_ars = []

    class _StubMultModel:
        """Callable taking the in_list input; returns a constant-slope ramp
        so AR content is predictable."""

        def __call__(self, cin_list, ar=None):
            seen_ars.append(np.asarray(ar))
            t_in = cin_list[0].shape[1]
            out = jnp.broadcast_to(
                jnp.arange(1, t_in * hop + 1, dtype=jnp.float32)[None, :, None],
                (1, t_in * hop, 1))
            return out

    config = {
        "dataset_mode": "a2w_mult", "batch_max_steps": chunk, "hop_size": hop,
        "sampling_rate": 16000, "hop_sizes": [hop], "sampling_rates": [16000],
        "generator_params": {
            "out_channels": 1, "use_ar": True, "ar_input": 32,  # > chunk
            "in_list": ["ema"]},
    }
    x = rng.standard_normal((12, 3)).astype(np.float32)  # 3 chunks of 4
    out = ar_loop(_StubMultModel(), x, config, modality=0)
    assert out.shape == (48,)  # 12 frames * hop
    # chunk 1 must see zeros; later chunks must see updated (nonzero) AR
    assert np.all(seen_ars[0] == 0)
    assert np.any(seen_ars[1] != 0), "shift register never updated"
    # the register keeps the last 32 outputs: 16 from chunk k-2 tail + 16
    # from chunk k-1 (ramp 1..16 twice after two chunks)
    np.testing.assert_allclose(seen_ars[2][0, -16:, 0],
                               np.arange(1, 17, dtype=np.float32))
