"""tools/eval_inversion.py: RMSE/correlation metrics over decoded
trajectories vs a feats.scp of ground-truth features."""

import os
import subprocess
import sys

import numpy as np

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "eval_inversion.py")


def test_metrics(tmp_path):
    rng = np.random.default_rng(0)
    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    scp = tmp_path / "feats.scp"
    lines = []
    for i in range(3):
        ref = rng.standard_normal((100, 4)).astype(np.float32)
        noise = 0.1 * rng.standard_normal((100, 4)).astype(np.float32)
        np.save(str(tmp_path / f"utt{i}.npy"), ref)
        # generated = ref + small noise, one frame longer (length trim path)
        gen = np.concatenate([ref + noise, ref[:1]], axis=0)
        np.save(str(gen_dir / f"utt{i}_gen.npy"), gen)
        lines.append(f"utt{i} {tmp_path / f'utt{i}.npy'}\n")
    scp.write_text("".join(lines))

    out = subprocess.run(
        [sys.executable, TOOL, "--gen-dir", str(gen_dir),
         "--feats-scp", str(scp)],
        capture_output=True, text=True, check=True).stdout
    assert "utterances: 3" in out
    rmse = float(out.split("mean RMSE: ")[1].split()[0])
    corr = float(out.split("mean Pearson r: ")[1].split()[0])
    assert 0.05 < rmse < 0.15  # ~0.1 noise
    assert corr > 0.98


def test_no_matches(tmp_path):
    (tmp_path / "feats.scp").write_text("u /nonexistent.npy\n")
    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    proc = subprocess.run(
        [sys.executable, TOOL, "--gen-dir", str(gen_dir),
         "--feats-scp", str(tmp_path / "feats.scp")],
        capture_output=True, text=True)
    assert proc.returncode != 0
    assert "no matching" in proc.stderr
