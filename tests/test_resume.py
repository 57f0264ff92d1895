"""--resume through the train CLI: steps/optimizer/scheduler continue."""

import os
import sys

import numpy as np
import pytest
import yaml


def test_cli_resume(tmp_path, monkeypatch, rng):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_e2e_pipeline import make_corpus, tiny_yaml

    monkeypatch.chdir(str(tmp_path))
    make_corpus(str(tmp_path), rng)
    cfg_path = tiny_yaml(str(tmp_path))

    from articulatory_tpu.bin import compute_statistics, normalize, preprocess
    from articulatory_tpu.bin import train as train_bin

    for name in ("tr_set", "dev_set"):
        monkeypatch.setattr(sys, "argv", [
            "preprocess", "--wav-scp", f"data/{name}/wav.scp",
            "--dumpdir", f"dump/{name}/raw", "--config", cfg_path,
            "--verbose", "0"])
        preprocess.main()
    monkeypatch.setattr(sys, "argv", [
        "compute_statistics", "--rootdir", "dump/tr_set/raw",
        "--config", cfg_path, "--dumpdir", "dump/tr_set", "--verbose", "0"])
    compute_statistics.main()
    for name in ("tr_set", "dev_set"):
        monkeypatch.setattr(sys, "argv", [
            "normalize", "--rootdir", f"dump/{name}/raw",
            "--dumpdir", f"dump/{name}/norm", "--stats", "dump/tr_set/stats.h5",
            "--config", cfg_path, "--verbose", "0"])
        normalize.main()

    # phase 1: 3 steps
    monkeypatch.setattr(sys, "argv", [
        "train", "--train-dumpdir", "dump/tr_set/norm",
        "--dev-dumpdir", "dump/dev_set/norm", "--outdir", "exp/r",
        "--config", cfg_path, "--verbose", "0"])
    train_bin.main()
    assert os.path.exists("exp/r/checkpoint-3steps.ckpt")

    # phase 2: resume to 6 steps
    cfg = yaml.safe_load(open(cfg_path))
    cfg["train_max_steps"] = 6
    yaml.dump(cfg, open(cfg_path, "w"))
    monkeypatch.setattr(sys, "argv", [
        "train", "--train-dumpdir", "dump/tr_set/norm",
        "--dev-dumpdir", "dump/dev_set/norm", "--outdir", "exp/r",
        "--config", cfg_path, "--resume", "exp/r/checkpoint-3steps.ckpt",
        "--verbose", "0"])
    train_bin.main()
    assert os.path.exists("exp/r/checkpoint-6steps.ckpt")

    # resumed params differ from the 3-step checkpoint (training continued)
    from articulatory_tpu.utils.checkpoint import load_checkpoint

    c3 = load_checkpoint("exp/r/checkpoint-3steps.ckpt")
    c6 = load_checkpoint("exp/r/checkpoint-6steps.ckpt")
    assert int(c3["steps"]) == 3 and int(c6["steps"]) == 6

    def first_leaf(d):
        while isinstance(d, dict):
            d = d[sorted(d)[0]]
        return np.asarray(d)

    assert np.abs(first_leaf(c3["model"]["generator"])
                  - first_leaf(c6["model"]["generator"])).max() > 0


def test_best_mel_restored_across_resume(tmp_path):
    """A continuation must not clobber a better best_mel_ckpt: the tracker
    is re-seeded from best_mel_step.txt's second field (our extension over
    the reference, which resets it to 1e6 on every launch, train.py:114)."""
    from articulatory_tpu.train.trainer import Trainer

    outdir = str(tmp_path)
    with open(os.path.join(outdir, "best_mel_step.txt"), "w") as f:
        f.write("151000 0.1681\n")
    tr = Trainer(config={}, state=None, train_step=None, eval_step=None,
                 schedulers={}, data_loader={}, outdir=outdir, writer=object())
    assert tr.best_mel_loss == pytest.approx(0.1681)

    # reference-format file (steps only) leaves the tracker at the default
    with open(os.path.join(outdir, "best_mel_step.txt"), "w") as f:
        f.write("151000\n")
    tr = Trainer(config={}, state=None, train_step=None, eval_step=None,
                 schedulers={}, data_loader={}, outdir=outdir, writer=object())
    assert tr.best_mel_loss == 1.0e6
