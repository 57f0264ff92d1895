"""Recipe stage-0 data prep: mk_ema_feats + pitch + combine_feats on a fake
MNGU0 download tree."""

import os
import subprocess
import sys

import numpy as np
import pytest


def test_stage0_pipeline(tmp_path, monkeypatch, rng):
    recipe = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                          "egs", "ema", "voc1"))
    monkeypatch.chdir(tmp_path)
    # fake MNGU0 tree
    raw = "downloads/emadata/cin_us_mngu0"
    for d in ("nema", "wav", "etc"):
        os.makedirs(f"{raw}/{d}", exist_ok=True)
    from articulatory_tpu.utils.io import write_wav

    n_utts = 8
    fids = [f"mngu0_s1_{i:04d}" for i in range(n_utts)]
    sr = 16000
    for i, fid in enumerate(fids):
        t = np.arange(sr) / sr
        wav = 0.3 * np.sin(2 * np.pi * (120 + 15 * i) * t)
        write_wav(f"{raw}/wav/{fid}.wav", wav, sr)
        ema = rng.standard_normal((200, 12))
        if i == n_utts - 1:
            ema[5, 3] = np.nan  # must be dropped
        with open(f"{raw}/nema/{fid}.ema", "w") as f:
            for row in ema:
                f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
    # txt.done.data format: ( fid "text" )
    train_fids, test_fids = fids[:6], fids[6:]
    with open(f"{raw}/etc/txt.done.data.train", "w") as f:
        for fid in train_fids:
            f.write(f'( {fid} "dummy" )\n')
    with open(f"{raw}/etc/txt.done.data.test", "w") as f:
        for fid in test_fids:
            f.write(f'( {fid} "dummy" )\n')

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(recipe, "..", "..", "..")) + os.pathsep + env.get(
            "PYTHONPATH", "")

    def run(script, *args):
        # mk_ema_feats uses NUM_VAL=60; shrink for the tiny corpus
        r = subprocess.run([sys.executable, os.path.join(recipe, "local", script),
                            *args], env=env, capture_output=True, text=True)
        assert r.returncode == 0, r.stdout + r.stderr

    # shrink the val split for the tiny corpus
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mk_ema_feats", os.path.join(recipe, "local", "mk_ema_feats.py"))
    mk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mk)
    mk.NUM_VAL = 2
    mk.main()

    assert os.path.exists("data/mngu0_train/feats.scp")
    with open("data/mngu0_test/feats.scp") as f:
        test_lines = f.readlines()
    # the NaN utterance (in the test split) was dropped
    assert len(test_lines) == len(test_fids) - 1

    run("pitch.py", raw, "--hop", "80")
    assert os.path.exists(f"{raw}/pitch_minmax.txt")
    p = np.load(f"{raw}/pitch/{fids[0]}.npy")
    assert p.shape == (sr // 80,)

    run("combine_feats.py", raw, "--feats", "pitch", "actions", "-o", "fnema")
    combined = np.load(f"{raw}/fnema/{fids[0]}.npy")
    assert combined.shape[1] == 13  # 1 pitch + 12 EMA
    # pitch channel minmax-normalized to [0, 1]
    assert combined[:, 0].min() >= 0.0 and combined[:, 0].max() <= 1.0
