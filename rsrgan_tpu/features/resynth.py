"""Waveform resynthesis from (enhanced) log-power-spectrum features.

The reference stops at feature arks — its enhanced LPS/MFCC go straight
into a Kaldi ASR decoder (/root/reference/README.md:36-48) and it never
reconstructs audio. For a speech-enhancement framework that is a real
gap: users want to *listen* to (and score) the enhanced signal. This
module inverts the `features/frontend.py` analysis chain with the
standard magnitude-replacement recipe:

    enhanced LPS  -> magnitude  = exp(0.5 * lps)
    noisy wave    -> complex STFT (same analysis chain, no dither)
    S = magnitude * noisy_phase
    S -> irfft -> weighted overlap-add (synthesis window = analysis
    window, normalized by the summed squared window) -> de-emphasis

WOLA with the sum-of-squared-windows denominator reconstructs unmodified
frames exactly (Griffin & Lim's LSEE-MSTFT synthesis), so the only
systematic error sources are the per-frame DC removal / per-frame
preemphasis of the Kaldi analysis chain (both frame-local, smoothed out
by the 60%-overlap WOLA average) and the energy slot: with
``raw_energy=True`` the analysis overwrote bin 0 with the frame log
energy, so the DC magnitude is taken from the noisy spectrum instead.

STFT/ISTFT are pure jax (jittable, TPU-friendly batched FFTs + one
scatter-add); the de-emphasis IIR runs on the host via scipy.lfilter
(it is O(num_samples) sequential — not worth a TPU scan for an offline
CLI path).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from rsrgan_tpu.features.frontend import (EPS_F32, FrameOptions,
                                          extract_frames, feature_window,
                                          process_frames)


def complex_spectrum(wave: jnp.ndarray, opts: FrameOptions) -> jnp.ndarray:
    """[num_samples] -> [num_frames, nfft/2+1] complex STFT.

    Exactly the `compute_spectrogram` analysis chain (DC removal,
    per-frame preemphasis, window, zero-pad to nfft) minus dither, so
    ``|complex_spectrum|**2`` floored at eps equals ``exp(lps)`` of a
    dither-free extraction (bins 1.. when raw_energy replaced bin 0).
    """
    frames = extract_frames(wave, opts)
    windowed, _ = process_frames(frames, opts, dither_key=None,
                                 return_log_energy=False)
    return jnp.fft.rfft(windowed, n=opts.padded_window_size, axis=1)


def overlap_add(frames: jnp.ndarray, opts: FrameOptions,
                num_samples: Optional[int] = None) -> jnp.ndarray:
    """WOLA synthesis: [num_frames, window_size] -> [num_samples].

    y[n] = sum_t w[n-tS] * frames[t, n-tS] / sum_t w^2[n-tS], the exact
    inverse of ``x -> w*x`` framing wherever the window-power sum is
    nonzero. Only snip_edges=True framing is supported (the extraction
    default; frame t covers samples [t*S, t*S+window)).
    """
    if not opts.snip_edges:
        raise NotImplementedError("overlap_add requires snip_edges=True")
    F, W = frames.shape
    S = opts.window_shift
    total = (F - 1) * S + W
    w = jnp.asarray(feature_window(opts))
    idx = (np.arange(F)[:, None] * S + np.arange(W)[None, :]).reshape(-1)
    num = jnp.zeros((total,), jnp.float32).at[idx].add(
        (frames * w[None, :]).reshape(-1))
    den = jnp.zeros((total,), jnp.float32).at[idx].add(
        jnp.broadcast_to(w * w, (F, W)).reshape(-1))
    # Floor the window-power sum at 1% of its peak: at the outermost
    # samples only one window tail covers n and den ~ w[k]^2 -> 0; for
    # MODIFIED spectra (frames no longer exactly w*x) dividing by it
    # amplifies the edge by 1/w[k]. Consistent frames still reconstruct
    # exactly wherever den is above the floor (the whole interior).
    den = jnp.maximum(den, 0.01 * jnp.max(den))
    y = num / den
    if num_samples is not None:
        y = (y[:num_samples] if total >= num_samples
             else jnp.pad(y, (0, num_samples - total)))
    return y


def deemphasize(wave: np.ndarray, coeff: float) -> np.ndarray:
    """Host-side inverse of the preemphasis filter: y[n] = x[n]+c*y[n-1]."""
    if coeff == 0.0:
        return np.asarray(wave, np.float32)
    from scipy.signal import lfilter

    return lfilter([1.0], [1.0, -coeff],
                   np.asarray(wave, np.float64)).astype(np.float32)


def resynthesize(lps: np.ndarray, noisy_wave: np.ndarray,
                 opts: FrameOptions = FrameOptions(),
                 raw_energy: bool = True) -> np.ndarray:
    """Enhanced LPS [F, nfft/2+1] + noisy wave -> enhanced wave [n].

    ``raw_energy`` must match the extraction config: when True, feature
    slot 0 holds the frame log energy (not the DC bin), so the DC
    magnitude is carried over from the noisy spectrum.
    """
    lps = np.asarray(lps, np.float32)
    spec = complex_spectrum(jnp.asarray(noisy_wave, jnp.float32), opts)
    F = min(int(spec.shape[0]), lps.shape[0])
    if F == 0:
        return np.zeros((0,), np.float32)
    spec = spec[:F]
    if lps.shape[1] != spec.shape[1]:
        raise ValueError(
            f"LPS dim {lps.shape[1]} != spectrum dim {spec.shape[1]} "
            f"(nfft={opts.padded_window_size}) — enhanced features must "
            "be denormalized log-power spectra from this frame config")
    mag = jnp.exp(0.5 * jnp.asarray(lps[:F]))
    noisy_mag = jnp.abs(spec)
    if raw_energy:
        mag = mag.at[:, 0].set(noisy_mag[:, 0])
    phase = spec / jnp.maximum(noisy_mag, np.sqrt(EPS_F32))
    frames = jnp.fft.irfft(mag * phase, n=opts.padded_window_size,
                           axis=1)[:, :opts.window_size]
    y = overlap_add(frames, opts, num_samples=int(noisy_wave.shape[0]))
    return deemphasize(np.asarray(y), opts.preemph_coeff)
