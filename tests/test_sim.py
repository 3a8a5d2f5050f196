"""Simulation subsystem tests: wav IO, convolution vs scipy, SNR mixing,
manifest parsing, corruption + extraction CLIs."""

import os

import numpy as np
import pytest
import scipy.signal

from rsrgan_tpu.sim import (SimulationOptions, corrupt_utterance,
                            fft_convolve, mix_at_snr, parse_noise_list,
                            parse_rir_list, pick_item_with_probability,
                            read_wav, reverberate, write_wav)


class TestWavIO:
    def test_roundtrip(self, tmp_path, rng):
        samples = (rng.normal(size=8000) * 5000).astype(np.float32)
        path = str(tmp_path / "a.wav")
        write_wav(path, samples, 16000)
        back, rate = read_wav(path)
        assert rate == 16000
        np.testing.assert_allclose(back, np.round(samples).clip(-32768,
                                                                32767),
                                   atol=1.0)


class TestDsp:
    def test_fft_convolve_matches_scipy(self, rng):
        x = rng.normal(size=1000).astype(np.float32)
        h = rng.normal(size=64).astype(np.float32)
        got = fft_convolve(x, h)
        expect = scipy.signal.fftconvolve(x, h)
        np.testing.assert_allclose(got, expect, atol=2e-2)

    def test_reverberate_shift_and_normalize(self, rng):
        x = rng.normal(size=2000).astype(np.float32) * 100
        rir = np.zeros(200, np.float32)
        rir[50] = 1.0  # pure delay of 50 samples
        rir[80] = 0.3
        wet = reverberate(x, rir, shift_output=True, normalize_output=True)
        assert wet.shape == x.shape
        # shift undone: direct path aligns with the dry signal
        corr_aligned = np.corrcoef(wet, x)[0, 1]
        assert corr_aligned > 0.9
        # power normalized
        assert abs(np.sum(wet ** 2) / np.sum(x ** 2) - 1.0) < 1e-3

    def test_mix_at_snr(self, rng):
        speech = rng.normal(size=16000).astype(np.float32) * 1000
        noise = rng.normal(size=16000).astype(np.float32) * 123
        for snr in (0.0, 10.0, 20.0):
            mixed = mix_at_snr(speech, noise, snr, rng)
            added = mixed - speech
            got_snr = 10 * np.log10(np.mean(speech ** 2)
                                    / np.mean(added ** 2))
            assert abs(got_snr - snr) < 0.5


class TestManifests:
    def test_parse_rir_list(self, tmp_path):
        path = tmp_path / "rir_list"
        path.write_text(
            "--rir-id r1 --room-id A /p/r1.wav\n"
            "--rir-id r2 --room-id A /p/r2.wav\n"
            "--rir-id r3 --room-id B /p/r3.wav\n")
        rooms = parse_rir_list(str(path))
        assert {r.room_id for r in rooms} == {"A", "B"}
        total = sum(r.probability for r in rooms)
        assert abs(total - 1.0) < 1e-9
        a = next(r for r in rooms if r.room_id == "A")
        assert len(a.rirs) == 2

    def test_parse_noise_list(self, tmp_path):
        path = tmp_path / "noise_list"
        path.write_text(
            "--noise-id n1 --noise-type point-source "
            "--bg-fg-type foreground /p/n1.wav\n"
            "--noise-id n2 --noise-type isotropic --bg-fg-type background "
            "/p/n2.wav\n")
        noises = parse_noise_list(str(path))
        assert noises[0].bg_fg_type == "foreground"
        assert noises[1].noise_type == "isotropic"
        assert abs(sum(n.probability for n in noises) - 1.0) < 1e-9

    def test_pick_with_probability(self, rng, tmp_path):
        path = tmp_path / "rir_list"
        path.write_text("--rir-id r1 --room-id A --probability 0.9 a.wav\n"
                        "--rir-id r2 --room-id B --probability 0.1 b.wav\n")
        rooms = parse_rir_list(str(path))
        counts = {"A": 0, "B": 0}
        for _ in range(300):
            counts[pick_item_with_probability(rng, rooms).room_id] += 1
        assert counts["A"] > counts["B"]


class TestEndToEnd:
    def test_corrupt_and_extract(self, tmp_path, rng):
        # build a tiny wav corpus + rir + noise
        wav_dir = tmp_path / "wavs"
        os.makedirs(wav_dir)
        scp = tmp_path / "wav.scp"
        lines = []
        for i in range(3):
            w = (rng.normal(size=16000) * 3000).astype(np.float32)
            p = str(wav_dir / f"u{i}.wav")
            write_wav(p, w)
            lines.append(f"u{i} {p}")
        scp.write_text("\n".join(lines) + "\n")
        rir = np.zeros(100, np.float32)
        rir[10] = 1.0
        rir[40] = 0.4
        write_wav(str(tmp_path / "rir.wav"), rir * 30000)
        noise = (rng.normal(size=32000) * 500).astype(np.float32)
        write_wav(str(tmp_path / "noise.wav"), noise)
        (tmp_path / "rir_list").write_text(
            f"--rir-id r0 --room-id A {tmp_path}/rir.wav\n")
        (tmp_path / "noise_list").write_text(
            f"--noise-id n0 --noise-type isotropic {tmp_path}/noise.wav\n")

        from rsrgan_tpu.cli import simulate
        out_dir = str(tmp_path / "rvb")
        rc = simulate.main([f"--wav_scp={scp}",
                            f"--rir_list={tmp_path}/rir_list",
                            f"--noise_list={tmp_path}/noise_list",
                            f"--output_dir={out_dir}"])
        assert rc == 0
        assert os.path.isfile(os.path.join(out_dir, "u1.wav"))

        from rsrgan_tpu.cli import extract
        feats_dir = str(tmp_path / "feats")
        rc = extract.main([f"--wav_scp={out_dir}/wav.scp",
                           "--feat_type=spectrogram",
                           f"--output_dir={feats_dir}", "--name=inputs",
                           "--dither=0", "--accumulate_cmvn"])
        assert rc == 0
        rc = extract.main([f"--wav_scp={scp}", "--feat_type=mfcc",
                           f"--output_dir={feats_dir}", "--name=labels",
                           "--dither=0", "--accumulate_cmvn"])
        assert rc == 0
        from rsrgan_tpu.data import ScpReader, read_kaldi_cmvn
        lps = ScpReader(os.path.join(feats_dir, "inputs.scp"))
        mfcc = ScpReader(os.path.join(feats_dir, "labels.scp"))
        _, m0 = lps.read_index(0)
        assert m0.shape[1] == 257
        _, c0 = mfcc.read_index(0)
        assert c0.shape[1] == 40
        stats = read_kaldi_cmvn(os.path.join(feats_dir, "inputs.cmvn"))
        assert stats.shape == (2, 258)


class TestExtractEdgeCases:
    def test_exact_frame_pad_multiple_with_tail(self, tmp_path, rng):
        """Wave whose frame count is an exact FRAME_PAD multiple but with
        trailing samples beyond the last frame (used to crash)."""
        from rsrgan_tpu.cli.extract import FRAME_PAD, JitExtractor
        from rsrgan_tpu.features import FrameOptions
        opts = FrameOptions(dither=0.0)
        n_samples = opts.window_size + opts.window_shift * (FRAME_PAD - 1) \
            + 100  # 100 extra tail samples -> n_frames == FRAME_PAD
        wave = rng.normal(size=n_samples).astype(np.float32) * 100
        ex = JitExtractor("spectrogram", opts, use_dither=False)
        feats = ex(wave, 0)
        assert feats.shape == (FRAME_PAD, 257)
        assert np.isfinite(feats).all()
