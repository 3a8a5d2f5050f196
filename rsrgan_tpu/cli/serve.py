"""Streaming enhancement CLI: bounded-latency serving over Kaldi I/O.

Beyond the reference (which only enhances offline, batch-1, whole
utterances — scripts/train_gan_rnn_placeholder.py:204-302): this driver
runs the flagship generator through serving.StreamingEnhancer, processing
each utterance in fixed-size chunks with carried recurrent state — the
processing mode an online dereverberation front-end needs. The chunked
forward is EXACT (res_lstm_l is causal; tests/test_streaming.py proves
bit-equality with the whole-utterance forward), so the emitted
feats.ark/feats.scp match an offline decode up to kernel dtype.

Usage::

    python -m rsrgan_tpu.cli.serve \
        --save_dir exp/gan_res_lstm_l --data_dir data/train/train_100h \
        --test_list_file data/test/test001/test.list \
        --chunk_frames 50

    # wav -> wav streaming (LPS->LPS checkpoints, --output_dim 257):
    python -m rsrgan_tpu.cli.serve \
        --save_dir exp/gan_lps2lps --data_dir data/train \
        --wav_scp noisy_wav.scp --output_dim 257 --chunk_frames 50

The wav mode runs the whole pipeline online — streaming LPS analysis,
carried-state generator forward, WOLA resynthesis with the current
chunk's noisy phase (serving/wav_stream.py) — and writes enhanced wavs
plus a wav.scp.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from rsrgan_tpu.data import (ArkWriter, UtteranceStore, infer_batches,
                             load_cmvn_npz, read_list_file)
from rsrgan_tpu.serving import StreamingEnhancer


def log(msg: str) -> None:
    print(msg)
    sys.stdout.flush()


def load_generator_params(args):
    """The generator's param tree from a training checkpoint."""
    from rsrgan_tpu.cli.train import build_trainer, model_name
    from rsrgan_tpu.serving.streaming import SUPPORTED_VARIANTS
    from rsrgan_tpu.training import load_checkpoint

    if args.g_type not in SUPPORTED_VARIANTS:
        raise SystemExit(f"serve supports --g_type in {SUPPORTED_VARIANTS} "
                         f"(got {args.g_type})")
    trainer = build_trainer(args, jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, args.input_dim), jnp.float32)
    lens = jnp.full((1,), 8, jnp.int32)
    state = trainer.init_state(rng, x, lens)
    state = load_checkpoint(args.save_dir, model_name(args), state,
                            moving_average=args.moving_average)
    if state is None:
        return None
    return state.g.params if hasattr(state, "g") else state.params


def serve_wavs(args, params, inputs_cmvn, labels_cmvn) -> int:
    """wav->wav streaming over an scp of noisy wavs."""
    from rsrgan_tpu.features.frontend import FrameOptions
    from rsrgan_tpu.serving.wav_stream import StreamingWavEnhancer
    from rsrgan_tpu.sim.wavio import read_wav, write_wav

    opts = FrameOptions(dither=0.0)
    enhancer = StreamingWavEnhancer(
        params, inputs_cmvn, labels_cmvn, variant=args.g_type,
        frame_opts=opts, chunk_frames=args.chunk_frames)

    out_dir = args.output_dir or os.path.join(args.save_dir, "stream_wav")
    os.makedirs(out_dir, exist_ok=True)
    with open(args.wav_scp) as f:
        entries = [line.strip().split(None, 1) for line in f if line.strip()]

    # feed in chunk-sized sample blocks (frames * shift per step)
    block = args.chunk_frames * opts.window_shift
    start = datetime.datetime.now()
    total = 0
    with open(os.path.join(out_dir, "wav.scp"), "w") as scp:
        for i, (utt_id, wav_path) in enumerate(entries):
            wave, rate = read_wav(wav_path)
            if rate != opts.samp_freq:
                log(f"WARNING: {utt_id} rate {rate} != "
                    f"{opts.samp_freq:g}")
            enhancer.reset()
            outs = [enhancer.process(wave[lo:lo + block])
                    for lo in range(0, len(wave), block)]
            outs.append(enhancer.flush())
            y = np.concatenate(outs)
            out_path = os.path.join(out_dir, f"{utt_id}.wav")
            write_wav(out_path, y, rate=int(rate))
            scp.write(f"{utt_id} {out_path}\n")
            total += len(wave)
            log(f"[{i + 1}/{len(entries)}] Streamed {utt_id} "
                f"({len(wave)} samples, blocks of {block})")
    took = (datetime.datetime.now() - start).total_seconds()
    log(f"Streaming done: {total} samples in {took:.2f}s "
        f"({total / max(took, 1e-9) / 16000:.2f}x realtime "
        "host-synced, single stream)")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--data_dir", required=True,
                   help="directory holding train_cmvn.npz")
    p.add_argument("--test_list_file", default=None,
                   help="feature-store mode input (required unless "
                        "--wav_scp is given)")
    p.add_argument("--wav_scp", default=None,
                   help="wav->wav streaming mode: scp of noisy wavs "
                        "(needs an LPS->LPS checkpoint, --output_dim 257)")
    p.add_argument("--output_dir", default=None,
                   help="default: <save_dir>/stream")
    p.add_argument("--chunk_frames", type=int, default=50,
                   help="frames per streamed chunk (latency bound)")
    p.add_argument("--g_type", default="res_lstm_l")
    p.add_argument("--trainer", default="gan_rnn")
    p.add_argument("--input_dim", type=int, default=257)
    p.add_argument("--output_dim", type=int, default=40)
    p.add_argument("--left_context", type=int, default=0)
    p.add_argument("--right_context", type=int, default=0)
    p.add_argument("--keep_prob", type=float, default=1.0)
    from rsrgan_tpu.cli.train import str2bool
    p.add_argument("--batch_norm", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--l2_scale", type=float, default=0.0)
    p.add_argument("--disc_updates", type=int, default=1)
    p.add_argument("--gen_updates", type=int, default=2)
    p.add_argument("--bf16", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--lstm_impl", default="scan",
                   help="impl used only to LOAD the checkpoint tree")
    p.add_argument("--moving_average", action="store_true")
    p.add_argument("--compress", action="store_true",
                   help="write a Kaldi CompressedMatrix ark")
    args, unknown = p.parse_known_args(argv)
    if unknown:
        log(f"WARNING: ignoring unknown flags {unknown}")
    if (args.test_list_file is None) == (args.wav_scp is None):
        p.error("exactly one of --test_list_file / --wav_scp is required")

    params = load_generator_params(args)
    if params is None:
        log("[!] Load failed. Checkpoint not found. Exit now.")
        return 1
    log("[*] Load SUCCESS")

    cmvn_path = os.path.join(args.data_dir, "train_cmvn.npz")
    inputs_cmvn, labels_cmvn = load_cmvn_npz(cmvn_path)

    if args.wav_scp:
        return serve_wavs(args, params, inputs_cmvn, labels_cmvn)

    store = UtteranceStore(read_list_file(args.test_list_file))
    enhancer = StreamingEnhancer(params, variant=args.g_type)

    out_dir = args.output_dir or os.path.join(args.save_dir, "stream")
    os.makedirs(out_dir, exist_ok=True)
    writer = ArkWriter(os.path.join(out_dir, "feats.scp"),
                       compress=args.compress)
    ark_path = os.path.join(out_dir, "feats.ark")

    start = datetime.datetime.now()
    total_frames = 0
    n = len(store)
    C = args.chunk_frames
    for i, batch in enumerate(infer_batches(store, args.left_context,
                                            args.right_context)):
        (utt_id,) = batch.utt_ids
        T = int(batch.lengths[0])
        x = np.asarray(batch.inputs[:1, :T])  # [1, T, 257] (unpadded)
        state = enhancer.init_state(batch=1)
        outs = []
        for lo in range(0, T, C):
            take = min(C, T - lo)
            chunk = np.zeros((1, C, x.shape[-1]), np.float32)
            chunk[:, :take] = x[:, lo:lo + take]
            # fixed [1, C, D] chunk shape -> ONE compiled program; the
            # final chunk's pad rows pollute only the discarded state
            y, state = enhancer.step(jnp.asarray(chunk), state)
            outs.append(np.asarray(y[0, :take]))
        enhanced = labels_cmvn.denormalize(np.concatenate(outs, axis=0))
        writer.write_next_utt(ark_path, utt_id,
                              enhanced.astype(np.float32))
        total_frames += T
        log(f"[{i + 1}/{n}] Streamed {utt_id} "
            f"({T} frames, chunks of {C})")
    writer.close()
    took = (datetime.datetime.now() - start).total_seconds()
    log(f"Streaming done: {total_frames} frames in {took:.2f}s "
        f"({total_frames / max(took, 1e-9):,.0f} frames/s host-synced)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
