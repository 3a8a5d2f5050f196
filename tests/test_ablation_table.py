"""tools/ablation_table.py: summary table + quality-gate behavior.

Stage 8 of recipes/run_ablation.sh runs after hours of training — these
tests pin its jsonl contract (cli.score per-utt keys) and the gate logic
so a scoring-summary bug can't surface only at the end of the long run.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

REPO = __file__.rsplit("/tests/", 1)[0]
sys.path.insert(0, REPO + "/tools")

import ablation_table  # noqa: E402


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _make_workdir(tmp_path, gan_lsd=7.0, gan_estoi=0.65):
    """Synthetic per-utt dumps with the exact keys cli.score emits
    (feats mode: lsd_db + mse + gv_ratio; wav mode:
    snr/si_snr/seg_snr/stoi/estoi)."""
    w = str(tmp_path)
    rng = np.random.default_rng(0)
    for sysname, lsd, mse, gv in (("noisy", 20.0, 2.0, 1.10),
                                  ("mse", 9.0, 0.4, 0.62),
                                  ("gan", gan_lsd, 0.45, 0.91)):
        _write_jsonl(f"{w}/feats_{sysname}.jsonl",
                     [{"utt_id": f"u{i}", "lsd_db": lsd + rng.normal(0, .1),
                       "mse": mse, "gv_ratio": gv} for i in range(10)])
    for sysname, st in (("noisy", 0.47), ("mse", 0.60), ("gan", gan_estoi)):
        _write_jsonl(f"{w}/wav_{sysname}.jsonl",
                     [{"utt_id": f"u{i}", "snr_db": 5.0, "si_snr_db": 4.0,
                       "seg_snr_db": 3.0, "stoi": st,
                       "estoi": st - 0.05 + rng.normal(0, .01)}
                      for i in range(10)])
    return w


def _args(w):
    return [w, f"--train_dir={w}", f"--gan_dir={w}", f"--mse_dir={w}"]


def test_table_and_gate_pass(tmp_path, capsys):
    w = _make_workdir(tmp_path)
    assert ablation_table.main(_args(w)) == 0
    out = capsys.readouterr().out
    assert "ABLATION QUALITY CHECK PASSED" in out
    md = open(f"{w}/ablation.md").read()
    assert "| no enhancement | 2.0000 | " in md
    data = json.load(open(f"{w}/ablation.json"))
    d = data["derived"]
    assert d["gan_lsd_ratio"] < 0.45 and d["gan_estoi_delta"] > 0.03
    # over-smoothing gaps: |1 - GV| per system (gan 0.91, mse 0.62)
    assert d["gan_gv_gap"] == pytest.approx(0.09, abs=1e-6)
    assert d["mse_gv_gap"] == pytest.approx(0.38, abs=1e-6)
    # every table column resolved (no "—" placeholders)
    assert "—" not in md.split("Derived")[0].split("|---|")[1]


def test_gate_fails_on_weak_gan(tmp_path, capsys):
    w = _make_workdir(tmp_path, gan_lsd=19.0, gan_estoi=0.48)
    assert ablation_table.main(_args(w)) == 1
    err = capsys.readouterr().err
    assert "GAN LSD ratio" in err and "GAN ESTOI delta" in err


def test_gate_thresholds_env_overridable(tmp_path, monkeypatch):
    w = _make_workdir(tmp_path, gan_lsd=19.0, gan_estoi=0.48)
    monkeypatch.setenv("ABLATION_MAX_LSD_RATIO", "1.5")
    monkeypatch.setenv("ABLATION_MIN_ESTOI_DELTA", "-1.0")
    assert ablation_table.main(_args(w)) == 0


def test_missing_wav_scores_render_as_dash(tmp_path):
    """feats-only dumps (e.g. resynth skipped) still produce a table and
    the gate judges on what exists."""
    w = _make_workdir(tmp_path)
    import os
    for s in ("noisy", "mse", "gan"):
        os.remove(f"{w}/wav_{s}.jsonl")
    rc = ablation_table.main(_args(w))
    md = open(f"{w}/ablation.md").read()
    assert "—" in md          # wav columns unresolved
    assert "| no enhancement | 2.0000 |" in md
    assert rc == 1            # ESTOI gate unsatisfiable without wav scores


def test_feats_only_with_disabled_estoi_gate_passes(tmp_path, monkeypatch):
    """The MFCC config (recipes/run_ablation_mfcc.sh stage 6) scores
    features only — no resynthesis is possible — and disables the ESTOI
    gate with ABLATION_MIN_ESTOI_DELTA=-1. That must pass, not trip the
    gate's missing-metric default (regression: -1.0 <= -1.0 fired)."""
    w = _make_workdir(tmp_path)
    import os
    for s in ("noisy", "mse", "gan"):
        os.remove(f"{w}/wav_{s}.jsonl")
    monkeypatch.setenv("ABLATION_MIN_ESTOI_DELTA", "-1")
    monkeypatch.setenv("ABLATION_MAX_LSD_RATIO", "0.9")
    assert ablation_table.main(_args(w)) == 0


def test_sweep_extras_and_aggregates(tmp_path, capsys):
    """Sweep rows (--extra) and seed-variance rows (--aggregate) render
    with mean ± half-range, as stage 8 invokes them for SEEDS/MSE_WEIGHTS
    grids."""
    w = _make_workdir(tmp_path)
    _write_jsonl(f"{w}/feats_gan_s778.jsonl",
                 [{"utt_id": f"u{i}", "lsd_db": 8.0, "mse": 0.5,
                   "gv_ratio": 0.95} for i in range(10)])
    _write_jsonl(f"{w}/wav_gan_s778.jsonl",
                 [{"utt_id": f"u{i}", "snr_db": 5.0, "si_snr_db": 4.0,
                   "seg_snr_db": 3.0, "stoi": 0.64, "estoi": 0.6}
                  for i in range(10)])
    rc = ablation_table.main(_args(w) + [
        "--extra=gan_s778:LSGAN(seed=778)",
        "--aggregate=LSGAN mean±spread (2 seeds):gan,gan_s778"])
    assert rc == 0
    md = open(f"{w}/ablation.md").read()
    assert "LSGAN(seed=778)" in md
    assert "±" in md
    data = json.load(open(f"{w}/ablation.json"))
    agg = data["systems"]["agg:LSGAN mean±spread (2 seeds)"]
    spread = data["systems"]["agg:LSGAN mean±spread (2 seeds):spread"]
    assert agg["lsd_db"] == pytest.approx(
        (data["systems"]["gan"]["lsd_db"]
         + data["systems"]["gan_s778"]["lsd_db"]) / 2, abs=1e-9)
    assert spread["lsd_db"] >= 0
