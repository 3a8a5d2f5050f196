"""Feature extraction CLI — replaces the external Kaldi feature stage.

Equivalent of ``compute-spectrogram-feats`` (257-dim LPS),
``compute-mfcc-feats --config=mfcc_hires.conf`` (40-dim MFCC) and
``compute-cmvn-stats`` (/root/reference/README.md:33-35, SURVEY.md 2.8):

    python -m rsrgan_tpu.cli.extract --wav_scp wav.scp \
        --feat_type spectrogram --output_dir feats --name inputs \
        [--accumulate_cmvn]

Writes ``<name>.ark`` / ``<name>.scp`` and optionally ``<name>.cmvn``
(Kaldi binary stats), all consumable by the prepare/train CLIs or by Kaldi
itself.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from rsrgan_tpu.data.cmvn import CmvnAccumulator, write_kaldi_cmvn
from rsrgan_tpu.data.kaldi_ark import ArkWriter
from rsrgan_tpu.features import (FrameOptions, MfccOptions,
                                 SpectrogramOptions, compute_mfcc_np,
                                 compute_spectrogram_np)
from rsrgan_tpu.sim.wavio import read_wav


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rsrgan_tpu.cli.extract")
    p.add_argument("--wav_scp", required=True)
    p.add_argument("--feat_type", choices=["spectrogram", "mfcc"],
                   required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--dither", type=float, default=1.0)
    p.add_argument("--dither_seed", type=int, default=0,
                   help="deterministic dither stream")
    p.add_argument("--accumulate_cmvn", action="store_true")
    args = p.parse_args(argv)

    frame_opts = FrameOptions(dither=args.dither)
    os.makedirs(args.output_dir, exist_ok=True)
    scp_path = os.path.join(args.output_dir, args.name + ".scp")
    ark_path = os.path.join(args.output_dir, args.name + ".ark")
    writer = ArkWriter(scp_path)
    acc = None

    with open(args.wav_scp) as f:
        entries = [line.strip().split(None, 1) for line in f if line.strip()]
    for idx, (utt_id, wav_path) in enumerate(entries):
        wave, rate = read_wav(wav_path)
        if rate != frame_opts.samp_freq:
            print(f"WARNING: {utt_id} rate {rate} != "
                  f"{frame_opts.samp_freq:g}", file=sys.stderr)
        seed = (args.dither_seed + idx) if args.dither > 0 else None
        if args.feat_type == "spectrogram":
            feats = compute_spectrogram_np(
                wave, SpectrogramOptions(frame_opts), seed=seed)
        else:
            feats = compute_mfcc_np(
                wave, MfccOptions(frame_opts=frame_opts), seed=seed)
        if acc is None and args.accumulate_cmvn:
            acc = CmvnAccumulator(feats.shape[1])
        if acc is not None:
            acc.accumulate(feats)
        writer.write_next_utt(ark_path, utt_id, feats)
    writer.close()
    if acc is not None:
        cmvn_path = os.path.join(args.output_dir, args.name + ".cmvn")
        write_kaldi_cmvn(cmvn_path, acc.stats_matrix())
        print(f"CMVN stats -> {cmvn_path}")
    print(f"Wrote {len(entries)} x {args.feat_type} -> {ark_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
