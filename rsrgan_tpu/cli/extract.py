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
import functools
import os
import sys

import numpy as np

from rsrgan_tpu.data.cmvn import CmvnAccumulator, write_kaldi_cmvn
from rsrgan_tpu.data.kaldi_ark import ArkWriter
from rsrgan_tpu.features import (FrameOptions, MfccOptions,
                                 SpectrogramOptions, compute_mfcc,
                                 compute_spectrogram, num_frames)
from rsrgan_tpu.sim.wavio import read_wav

FRAME_PAD = 200  # jit shapes quantized to 2-second frame blocks


class JitExtractor:
    """Compiled feature extraction over a small set of padded lengths.

    Waves are zero-padded so the frame count is a FRAME_PAD multiple; one
    jitted program per padded length serves the whole corpus (with the
    persistent compile cache, across runs too).
    """

    def __init__(self, feat_type: str, frame_opts: FrameOptions,
                 use_dither: bool):
        import jax

        self.jax = jax
        self.feat_type = feat_type
        self.frame_opts = frame_opts
        self.use_dither = use_dither

    @functools.lru_cache(maxsize=None)
    def _fn(self, padded_samples: int):
        jax = self.jax
        if self.feat_type == "spectrogram":
            opts = SpectrogramOptions(self.frame_opts)
            compute = compute_spectrogram
        else:
            opts = MfccOptions(frame_opts=self.frame_opts)
            compute = compute_mfcc
        if self.use_dither:
            return jax.jit(lambda w, key: compute(w, opts, key))
        return jax.jit(lambda w: compute(w, opts))

    def __call__(self, wave: np.ndarray, seed: int) -> np.ndarray:
        opts = self.frame_opts
        n_frames = num_frames(len(wave), opts)
        if n_frames == 0:
            return np.zeros((0, 257 if self.feat_type == "spectrogram"
                             else 40), np.float32)
        pad_frames = -(-n_frames // FRAME_PAD) * FRAME_PAD
        padded_samples = opts.window_size + opts.window_shift * (
            pad_frames - 1)
        padded = np.zeros(padded_samples, np.float32)
        # the wave may extend past the last kept frame's span (frames are
        # snipped); samples beyond padded_samples contribute to no frame
        n_copy = min(len(wave), padded_samples)
        padded[:n_copy] = wave[:n_copy]
        if self.use_dither:
            feats = self._fn(padded_samples)(
                padded, self.jax.random.PRNGKey(seed))
        else:
            feats = self._fn(padded_samples)(padded)
        return np.asarray(feats)[:n_frames]


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
    p.add_argument("--compress", action="store_true",
                   help="write Kaldi CompressedMatrix arks "
                        "(copy-feats --compress=true equivalent)")
    p.add_argument("--text", action="store_true",
                   help="write a Kaldi TEXT archive (ark,t: equivalent)")
    args = p.parse_args(argv)

    from rsrgan_tpu.tunnel import ensure_device_up
    ensure_device_up()  # defend against the axon handoff futex hang

    frame_opts = FrameOptions(dither=args.dither)
    os.makedirs(args.output_dir, exist_ok=True)
    scp_path = os.path.join(args.output_dir, args.name + ".scp")
    ark_path = os.path.join(args.output_dir, args.name + ".ark")
    writer = ArkWriter(scp_path, compress=args.compress, text=args.text)
    acc = None

    extractor = JitExtractor(args.feat_type, frame_opts, args.dither > 0)

    with open(args.wav_scp) as f:
        entries = [line.strip().split(None, 1) for line in f if line.strip()]
    for idx, (utt_id, wav_path) in enumerate(entries):
        wave, rate = read_wav(wav_path)
        if rate != frame_opts.samp_freq:
            print(f"WARNING: {utt_id} rate {rate} != "
                  f"{frame_opts.samp_freq:g}", file=sys.stderr)
        feats = extractor(wave, args.dither_seed + idx)
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
