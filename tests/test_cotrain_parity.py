"""Long-horizon co-training parity harness (tools/cotrain_parity.py).

The committed artifact tools/artifacts/cotrain_parity.json is the full
500-step statement (trajectory envelope + trained-model MCD); this test
executes the same harness end to end at a shortened horizon so the claim
stays continuously verified:

- float64 co-training (rounding ~1e-16/op) over a horizon that crosses the
  discriminator_train_start_steps flip AND two MultiStepLR milestones,
  asserting per-step and eval-mel trajectories agree to ~1e-9 and the
  trained-model cross-framework MCD is ~0 — any semantic drift source the
  4-step f32 test cannot see (optimizer eps placement, clip-then-step
  order, scheduler step timing, gating off-by-one) would blow these up
  exponentially over the run.

Runs in a subprocess: jax_enable_x64 is process-global and must not leak
into the rest of the suite.
"""

import json
import os
import subprocess
import sys

from conftest import requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@requires_reference
def test_cotrain_parity_x64_short_horizon(tmp_path):
    out = str(tmp_path / "cotrain.json")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "cotrain_parity.py"),
         "--steps", "40", "--disc-start", "10", "--milestones", "15", "25",
         "--eval-every", "10", "--n-train-utts", "6", "--n-dev-utts", "2",
         "--n-eval-batches", "1", "--n-decode", "1", "--decode-frames", "120",
         "--batch-size", "2", "--batch-max-steps", "2400", "--x64",
         "--envelope-pre", "1e-9", "--envelope-eval", "1e-9",
         "--learn-factor", "1.05", "--mcd-budget", "0.01",
         "--out", out],
        env=env)
    assert rc == 0, "cotrain parity harness reported envelope violations"
    report = json.load(open(out))
    assert report["ok"], report["failures"]
    # disc phase really fired and was compared on both sides
    assert any("disc" in r for r in report["torch"]["logs"])
    assert any("disc" in r for r in report["ours"]["logs"])
    # f64 leaves no room for semantic drift
    assert report["checks"]["pre_disc_mel_max_rel"] < 1e-9
    assert report["checks"]["eval_mel_max_rel"] < 1e-9
    assert report["checks"]["worst_mcd_ours_vs_ref"] < 0.01


@requires_reference
def test_cotrain_committed_artifact_is_green():
    """The committed 500-step artifact must exist and be a passing run with
    the documented profile (disc-start + 2 LR milestones mid-run)."""
    path = os.path.join(REPO, "tools", "artifacts", "cotrain_parity.json")
    assert os.path.exists(path), "committed co-training artifact missing"
    report = json.load(open(path))
    assert report["ok"], report["failures"]
    cfg = report["config"]
    assert cfg["steps"] >= 300
    assert 0 < cfg["disc_start"] < cfg["steps"]
    assert all(cfg["disc_start"] < m < cfg["steps"] for m in cfg["milestones"])
    assert report["checks"]["worst_mcd_ours_vs_ref"] <= cfg["mcd_budget"]


@requires_reference
def test_cotrain_noise_cone_artifact_is_green():
    """The chaotic-regime artifact: at the flagship lr (1e-4) pointwise
    parity past the Lyapunov horizon is unattainable for ANY implementation,
    so the bound is containment in the reference's OWN 1-ulp self-drift
    cone — and our eval-mel drift from the reference must not exceed the
    reference's own self-drift."""
    path = os.path.join(REPO, "tools", "artifacts", "cotrain_noise_cone.json")
    assert os.path.exists(path), "noise-cone co-training artifact missing"
    report = json.load(open(path))
    assert report["ok"], report["failures"]
    c = report["checks"]
    assert c["worst_mcd_ours_vs_ref"] <= 2.0 * c["worst_mcd_ref_vs_refpert"]
    # we track the reference's trajectory at least as well as the reference
    # tracks itself across 1 ulp (measured: 0.42% vs 0.77%)
    assert c["eval_mel_max_rel"] <= c["self_eval_mel_max_rel"] * 1.5


def test_cotrain_512_artifact_is_green():
    """The round-5 flagship-width artifact: exact e2w_hifigan_car generator
    geometry (channels 512, full 3/7/11 MRF, ar 512/256/128), f64
    co-training with a 1-ulp control at factor 1.0. The semantic claim is
    the pre-disc per-step exactness (~1e-9); the decode-MCD gate rides the
    measured exchange-rate cone (the raw f64 1-ulp cone is below any
    cross-framework op-reordering floor — see --cone-exchange-rate)."""
    path = os.path.join(REPO, "tools", "artifacts", "cotrain_parity_512.json")
    assert os.path.exists(path), "flagship-width co-training artifact missing"
    report = json.load(open(path))
    assert report["ok"], report["failures"]
    cfg, c = report["config"], report["checks"]
    assert report["gen_cfg"]["channels"] == 512
    assert report["gen_cfg"]["resblock_kernel_sizes"] == [3, 7, 11]
    assert report["gen_cfg"]["ar_input"] == 512
    assert cfg["x64"] and cfg["self_drift"] and cfg["self_mcd_factor"] == 1.0
    assert 0 < cfg["disc_start"] < cfg["steps"]
    # flagship-width semantic exactness: per-step tracking at the 1e-9
    # scale before the adversarial phase turns on
    assert c["pre_disc_mel_max_rel"] < 1e-8
    # eval trajectory inside the stated envelope
    assert c["eval_mel_max_rel"] <= cfg["envelope_eval"]
    # decode MCD inside the exchange-rate-transferred control cone
    assert c["worst_mcd_ours_vs_ref"] <= c["cone_exchange_bound"]
    # trained-model quality: ours is at least as close to ground truth
    assert all(d <= 0.0 for d in c["gt_mcd_delta_per_utt"])


def test_cone_exchange_rate_gate_mechanics():
    """check() with --cone-exchange-rate: the decode bound scales the
    1-ulp cone by the measured eval-gap ratio; without the flag the raw
    cone applies."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import argparse

    from cotrain_parity import check

    def mk_report():
        return {
            "torch": {"logs": [], "evals": [[10, 4.0], [20, 3.0]]},
            "ours": {"logs": [], "evals": [[10, 4.0], [20, 3.003]]},
            "self_drift": {"logs": [],
                           "evals": [[10, 4.0], [20, 3.000003]]},
            "decode": [{"mcd_ours_vs_ref": 0.5,
                        "mcd_ref_vs_refpert": 1e-3,
                        "mcd_ours_vs_gt": 10.0, "mcd_ref_vs_gt": 10.1}],
            "checks": {},
        }

    base = dict(disc_start=0, envelope_pre=1.0, envelope_eval=1.0,
                learn_factor=2.0, mcd_budget=0.1, self_mcd_factor=1.0)
    # without the flag: 0.5 dB >> max(0.1, 1e-3) -> fails the cone check
    a = argparse.Namespace(**base, cone_exchange_rate=False)
    fails = check(mk_report(), a)
    assert any("noise cone" in f for f in fails), fails
    # with the flag: exchange = 1e-3/1e-6 = 1000 -> bound 1.0 dB -> passes
    a = argparse.Namespace(**base, cone_exchange_rate=True)
    report = mk_report()
    fails = check(report, a)
    assert not any("noise cone" in f for f in fails), fails
    assert report["checks"]["cone_exchange_bound"] >= 0.5
    assert report["checks"]["gt_mcd_delta_per_utt"] == [10.0 - 10.1]


def test_cotrain_512_f32_artifact_is_green():
    """Round-5 bonus: the chaotic-regime (f32, flagship lr 1e-4) run at
    FULL flagship width. Floors are matched at f32 (ulp ~ cross-framework
    rounding), so the RAW 1-ulp cone is the honest yardstick here."""
    path = os.path.join(REPO, "tools", "artifacts",
                        "cotrain_parity_512_f32.json")
    assert os.path.exists(path), "f32 flagship-width artifact missing"
    report = json.load(open(path))
    assert report["ok"], report["failures"]
    c, cfg = report["checks"], report["config"]
    assert report["gen_cfg"]["channels"] == 512 and not cfg["x64"]
    # near-raw-cone containment (round-4 width-128 run was 1.11x)
    assert c["worst_mcd_ours_vs_ref"] <= 1.1 * c["worst_mcd_ref_vs_refpert"]
    # we track the reference's trajectory better than it tracks itself
    assert c["eval_mel_max_rel"] <= c["self_eval_mel_max_rel"]
    assert all(d <= 0.0 for d in c["gt_mcd_delta_per_utt"])
