"""Executed SSL inversion plumbing (VERDICT round-1 #3).

The reference's speech->EMA scripts run HuBERT/WavLM features through the
inversion models (reference egs/ema/voc1/local/predict_ema.py:85-90,
linear_inference.py:27-41). No pretrained weights exist in this zero-egress
environment, so these tests instantiate TINY randomly-initialized
HuBERT/WavLM models via the installed ``transformers`` and drive the exact
hidden-state -> interpolate -> ar_loop / sklearn-regression plumbing end to
end through the real scripts.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCAL = os.path.join(ROOT, "egs", "ema", "voc1", "local")


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(LOCAL, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_hubert_dir(tmp_path):
    import torch
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(0)
    cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16, 16, 16, 16, 16),
        vocab_size=10)
    model = HubertModel(cfg)
    d = str(tmp_path / "tiny_hubert")
    model.save_pretrained(d)
    return d, cfg.hidden_size


def _tiny_wavlm_dir(tmp_path):
    import torch
    from transformers import WavLMConfig, WavLMModel

    torch.manual_seed(0)
    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16, 16, 16, 16, 16),
        vocab_size=10)
    model = WavLMModel(cfg)
    d = str(tmp_path / "tiny_wavlm")
    model.save_pretrained(d)
    return d, cfg.hidden_size


def test_hubert_feature_interpolation(tmp_path, rng, monkeypatch):
    """hidden_states -> x4 linear interpolation parity with the reference's
    F.interpolate call (predict_ema.py:85-90)."""
    import torch

    d, hidden = _tiny_hubert_dir(tmp_path)
    monkeypatch.setenv("ARTICULATORY_HUBERT_MODEL", d)
    pe = _load_script("predict_ema")

    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    feat = pe.hubert_features(audio, interp_factor=4)
    assert feat.shape[1] == hidden
    # frame rate: conv stack downsamples by 320 (20 ms); x4 -> 200 Hz
    n_frames_50hz = pe._load_hubert()(
        torch.from_numpy(audio)[None]).last_hidden_state.shape[1]
    assert feat.shape[0] == n_frames_50hz * 4
    assert np.all(np.isfinite(feat))
    # interpolation is exactly torch's linear/align_corners=False
    states = pe._load_hubert()(
        torch.from_numpy(audio)[None]).last_hidden_state.detach()
    want = torch.nn.functional.interpolate(
        states.transpose(1, 2), size=n_frames_50hz * 4, mode="linear",
        align_corners=False).transpose(1, 2)[0].numpy()
    np.testing.assert_allclose(feat, want, rtol=1e-6, atol=1e-6)


def test_predict_ema_hubert_end_to_end(tmp_path, rng, monkeypatch):
    """Full script run: wav dir -> tiny HuBERT -> w2a BiGRU AR loop -> .npy."""
    from articulatory_tpu.models import BiGRU
    from articulatory_tpu.utils.io import write_wav
    import flax.serialization

    d, hidden = _tiny_hubert_dir(tmp_path)
    monkeypatch.setenv("ARTICULATORY_HUBERT_MODEL", d)

    out_ch, ar_input = 12, 48
    config = {
        "dataset_mode": "w2a", "batch_max_steps": 100, "hop_size": 80,
        "sampling_rate": 16000, "format": "hdf5",
        "generator_type": "BiGRU",
        "generator_params": {"in_channels": hidden, "hidden_size": 16,
                             "out_channels": out_ch, "use_ar": True,
                             "ar_input": ar_input, "ar_hidden": 8,
                             "ar_output": 8},
    }
    model = BiGRU(in_channels=hidden, hidden_size=16, out_channels=out_ch,
                  use_ar=True, ar_input=ar_input, ar_hidden=8, ar_output=8)
    ar0 = jnp.zeros((1, ar_input // out_ch, out_ch))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 100, hidden)), ar=ar0, train=False)
    payload = {
        "model": {"generator": jax.tree.map(np.asarray, variables["params"])},
        "mutables": {"generator": jax.tree.map(
            np.asarray, {"batch_stats": variables["batch_stats"]})},
        "optimizer": {}, "scheduler": {}, "steps": 0, "epochs": 0,
    }
    exp_dir = tmp_path / "exp" / "mngu0_w2a_h2"   # '_h2' -> hubert modality
    exp_dir.mkdir(parents=True)
    with open(exp_dir / "best_mel_ckpt.pkl", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    with open(exp_dir / "config.yml", "w") as f:
        yaml.dump(config, f)

    wav_d = tmp_path / "wavs"
    wav_d.mkdir()
    for i in range(2):
        wav = rng.standard_normal(16000 + 800 * i).astype(np.float32) * 0.1
        write_wav(str(wav_d / f"utt{i}.wav"), wav, 16000)
    out_d = tmp_path / "pred_ema"

    pe = _load_script("predict_ema")
    monkeypatch.setattr(sys, "argv", [
        "predict_ema.py", str(exp_dir), str(wav_d), str(out_d)])
    pe.main()

    for i in range(2):
        pred = np.load(out_d / f"utt{i}.npy")
        assert pred.shape[1] == out_ch
        assert pred.shape[0] > 150  # ~200 Hz trajectory for >=1 s audio
        assert np.all(np.isfinite(pred))

    # the compiled-scan serving path (--ar-scan) matches the host chunk
    # loop on all complete chunks
    out_scan = tmp_path / "pred_ema_scan"
    monkeypatch.setattr(sys, "argv", [
        "predict_ema.py", str(exp_dir), str(wav_d), str(out_scan),
        "--ar-scan"])
    pe.main()
    for i in range(2):
        a = np.load(out_d / f"utt{i}.npy")
        b = np.load(out_scan / f"utt{i}.npy")
        # exact on the full length: complete chunks ride the compiled scan,
        # the ragged tail its seeded short-chunk forward
        assert len(b) == len(a)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)

    # lane batching (--batch N [--ar-scan]): same lengths as the sequential
    # run, matching on all complete chunks (ragged tails see lane padding)
    for name, extra in (("lanes", ["--batch", "2"]),
                        ("lanes_scan", ["--batch", "2", "--ar-scan"])):
        out_l = tmp_path / f"pred_ema_{name}"
        monkeypatch.setattr(sys, "argv", [
            "predict_ema.py", str(exp_dir), str(wav_d), str(out_l)] + extra)
        pe.main()
        for i in range(2):
            a = np.load(out_d / f"utt{i}.npy")
            b = np.load(out_l / f"utt{i}.npy")
            assert len(b) == len(a)
            full = (len(a) // 100) * 100
            np.testing.assert_allclose(b[:full], a[:full],
                                       rtol=1e-4, atol=1e-5)


def test_predict_ema_mfcc_end_to_end(tmp_path, rng, monkeypatch):
    """MFCC modality through the same script (no '_h2' in exp id)."""
    from articulatory_tpu.models import BiGRU
    from articulatory_tpu.utils.io import write_wav
    import flax.serialization

    out_ch = 12
    config = {
        "dataset_mode": "w2a", "batch_max_steps": 100, "hop_size": 80,
        "sampling_rate": 16000, "format": "hdf5",
        "generator_type": "BiGRU",
        "generator_params": {"in_channels": 13, "hidden_size": 16,
                             "out_channels": out_ch, "use_ar": False},
    }
    model = BiGRU(in_channels=13, hidden_size=16, out_channels=out_ch)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 50, 13)), train=False)
    payload = {
        "model": {"generator": jax.tree.map(np.asarray, variables["params"])},
        "mutables": {"generator": jax.tree.map(
            np.asarray, {"batch_stats": variables["batch_stats"]})},
        "optimizer": {}, "scheduler": {}, "steps": 0, "epochs": 0,
    }
    exp_dir = tmp_path / "exp" / "mngu0_w2a_mfcc"
    exp_dir.mkdir(parents=True)
    with open(exp_dir / "best_mel_ckpt.pkl", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    with open(exp_dir / "config.yml", "w") as f:
        yaml.dump(config, f)

    wav_d = tmp_path / "wavs"
    wav_d.mkdir()
    write_wav(str(wav_d / "utt0.wav"),
              rng.standard_normal(8000).astype(np.float32) * 0.1, 16000)
    out_d = tmp_path / "pred_ema"

    pe = _load_script("predict_ema")
    monkeypatch.setattr(sys, "argv", [
        "predict_ema.py", str(exp_dir), str(wav_d), str(out_d)])
    pe.main()
    pred = np.load(out_d / "utt0.npy")
    assert pred.shape[1] == out_ch and np.all(np.isfinite(pred))


def test_predict_ema_rejects_malformed_flags(tmp_path, monkeypatch):
    """ADVICE r4: trailing-flag parsing must fail loudly — --batch without
    a value, a non-integer value, and misspelled flags all exit with a
    clear message instead of IndexError / silent ignore."""
    pe = _load_script("predict_ema")
    for argv in (["predict_ema.py", "exp", "wavs", "out", "--batch"],
                 ["predict_ema.py", "exp", "wavs", "out", "--batch", "x"],
                 ["predict_ema.py", "exp", "wavs", "out", "--batch", "0"],
                 ["predict_ema.py", "exp", "wavs", "out", "--ar_scan"]):
        monkeypatch.setattr(sys, "argv", argv)
        with pytest.raises(SystemExit) as exc:
            pe.main()
        assert "predict_ema.py:" in str(exc.value)


def test_linear_inference_end_to_end(tmp_path, rng, monkeypatch):
    """wav -> tiny WavLM layer features -> sklearn regressor -> EMA .npy."""
    import joblib
    from sklearn.linear_model import LinearRegression

    from articulatory_tpu.utils.io import write_wav

    d, hidden = _tiny_wavlm_dir(tmp_path)
    monkeypatch.setenv("ARTICULATORY_WAVLM_MODEL", d)

    reg = LinearRegression()
    reg.fit(rng.standard_normal((100, hidden)), rng.standard_normal((100, 12)))
    reg_path = str(tmp_path / "linear.joblib")
    joblib.dump(reg, reg_path)

    wav_path = str(tmp_path / "utt.wav")
    write_wav(wav_path, rng.standard_normal(16000).astype(np.float32) * 0.1,
              16000)
    out_path = str(tmp_path / "pred.npy")

    li = _load_script("linear_inference")
    monkeypatch.setattr(sys, "argv", [
        "linear_inference.py", wav_path, reg_path, out_path])
    li.main()
    pred = np.load(out_path)
    assert pred.shape[1] == 12
    assert pred.shape[0] > 40  # ~50 Hz features for 1 s
    assert np.all(np.isfinite(pred))
