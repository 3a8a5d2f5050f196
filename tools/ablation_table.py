"""Summarize recipes/run_ablation.sh scores into a GAN/MSE/baseline table.

Reads the per-utterance JSONL dumps written by cli.score in stage 7 and
emits `ablation.md` (markdown table) + `ablation.json` under the workdir,
then asserts the enhancement wins are unambiguous (thresholds overridable
via env for smoke runs: ABLATION_MAX_LSD_RATIO, ABLATION_MIN_ESTOI_DELTA).

This is the evidence for the reference's core claim (LSGAN beats plain MSE
regression for dereverberation, /root/reference/README.md:5,36-48): same
corpus, same generator, same held-out set — only the training objective
differs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

SYSTEMS = ["noisy", "mse", "gan"]
LABELS = {"noisy": "no enhancement", "mse": "MSE (run_rnn.sh schedule)",
          "gan": "LSGAN (flagship schedule)"}


def _means(path):
    if not os.path.exists(path):
        return {}
    rows = [json.loads(line) for line in open(path)]
    keys = [k for k in rows[0] if k != "utt_id"]
    out = {}
    for k in keys:
        vals = [r[k] for r in rows if r.get(k) is not None
                and np.isfinite(r[k])]
        out[k] = float(np.mean(vals)) if vals else None
    out["num_utts"] = len(rows)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("workdir")
    p.add_argument("--train_dir", required=True)
    p.add_argument("--gan_dir", required=True)
    p.add_argument("--mse_dir", required=True)
    args = p.parse_args(argv)
    w = args.workdir

    stats = {}
    for sys_name in SYSTEMS:
        stats[sys_name] = {**_means(f"{w}/feats_{sys_name}.jsonl"),
                           **_means(f"{w}/wav_{sys_name}.jsonl")}

    cols = [("feature-MSE", "mse", "{:.4f}"),
            ("LSD (dB)", "lsd_db", "{:.3f}"),
            ("GV ratio", "gv_ratio", "{:.4f}"),
            ("SI-SNR (dB)", "si_snr_db", "{:.2f}"),
            ("STOI", "stoi", "{:.4f}"),
            ("ESTOI", "estoi", "{:.4f}")]
    lines = ["| system | " + " | ".join(c[0] for c in cols) + " |",
             "|---|" + "---|" * len(cols)]
    for sys_name in SYSTEMS:
        row = [LABELS[sys_name]]
        for _, key, fmt in cols:
            v = stats[sys_name].get(key)
            row.append(fmt.format(v) if v is not None else "—")
        lines.append("| " + " | ".join(row) + " |")
    table = "\n".join(lines)

    noisy, mse, gan = stats["noisy"], stats["mse"], stats["gan"]
    derived = {}
    if gan.get("lsd_db") and noisy.get("lsd_db"):
        derived["gan_lsd_ratio"] = round(gan["lsd_db"] / noisy["lsd_db"], 4)
        derived["mse_lsd_ratio"] = round(mse["lsd_db"] / noisy["lsd_db"], 4)
    if gan.get("estoi") is not None and noisy.get("estoi") is not None:
        derived["gan_estoi_delta"] = round(gan["estoi"] - noisy["estoi"], 4)
        derived["mse_estoi_delta"] = round(mse["estoi"] - noisy["estoi"], 4)
        derived["gan_vs_mse_estoi"] = round(gan["estoi"] - mse["estoi"], 4)
    if gan.get("gv_ratio") is not None and mse.get("gv_ratio") is not None:
        # over-smoothing: |1 - GV| measures distance from the clean
        # spectra's temporal dynamics (MSE regression under-shoots it;
        # the adversarial term exists to restore it)
        derived["gan_gv_gap"] = round(abs(1.0 - gan["gv_ratio"]), 4)
        derived["mse_gv_gap"] = round(abs(1.0 - mse["gv_ratio"]), 4)

    md = (f"# Ablation: {LABELS['gan']} vs {LABELS['mse']} vs baseline\n\n"
          f"Held-out set: {noisy.get('num_utts', 0)} utterances, "
          f"same corpus / generator / decode for both systems.\n\n"
          f"{table}\n\nDerived: {json.dumps(derived)}\n")
    with open(f"{w}/ablation.md", "w") as f:
        f.write(md)
    with open(f"{w}/ablation.json", "w") as f:
        json.dump({"systems": stats, "derived": derived}, f, indent=1)
    print(md)

    max_ratio = float(os.environ.get("ABLATION_MAX_LSD_RATIO", "0.45"))
    min_delta = float(os.environ.get("ABLATION_MIN_ESTOI_DELTA", "0.03"))
    ok = True
    if derived.get("gan_lsd_ratio", 1.0) >= max_ratio:
        print(f"FAIL: GAN LSD ratio {derived.get('gan_lsd_ratio')} >= "
              f"{max_ratio}", file=sys.stderr)
        ok = False
    if derived.get("gan_estoi_delta", -1.0) <= min_delta:
        print(f"FAIL: GAN ESTOI delta {derived.get('gan_estoi_delta')} <= "
              f"{min_delta}", file=sys.stderr)
        ok = False
    if ok:
        print("ABLATION QUALITY CHECK PASSED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
