// Independent C++ oracle for Kaldi-style feature extraction.
//
// Purpose: break the self-referential parity loop around the float32
// feature contract (round-1 VERDICT weakness #2). This file is written
// FROM THE PUBLISHED KALDI ALGORITHM (src/feat/feature-window.cc,
// feature-spectrogram.cc, mel-computations.cc, feature-mfcc.cc,
// feature-functions.cc semantics) independently of the JAX front-end in
// rsrgan_tpu/features/: different language, its own radix-2 FFT, double
// precision throughout. It shares NO code or constants files with the
// Python implementation; agreement of the two within float32 tolerance
// is evidence both implement the same math.
//
// It is an oracle, not a Kaldi build: the genuine
// "produced by compute-*-feats" fixtures still require a Kaldi binary,
// which this image does not have (documented in docs/FEATURE_PARITY.md).
//
// Usage:
//   kaldi_feat_oracle (spectrogram|mfcc) <wave.f32le> <out.mat> \
//       [samp_freq=16000]
// Input: raw little-endian float32 samples at 16-bit PCM scale.
// Output: int32 rows, int32 cols, then rows*cols little-endian float32.
// Options are fixed to the reference pipeline's configuration:
// 25 ms/10 ms povey window, preemph 0.97, remove-dc, round-to-pow2,
// snip-edges, raw energy, dither=0 (parity runs are undithered);
// MFCC = hires: 40 mel bins 20..Nyquist-400 Hz, 40 ceps, no energy,
// lifter 22.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;
// Kaldi floors powers/energies at float32 epsilon even in double math.
const double kFloor = static_cast<double>(std::numeric_limits<float>::epsilon());

// ---------------------------------------------------------------------------
// Iterative radix-2 complex FFT (decimation in time), double precision.
// Own implementation -- deliberately NOT numpy/pocketfft/Kaldi srfft.
// ---------------------------------------------------------------------------
void Fft(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  if (n == 0 || (n & (n - 1)) != 0) {
    std::fprintf(stderr, "fft size must be a power of two\n");
    std::exit(3);
  }
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / static_cast<double>(len);
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cur_r = 1.0, cur_i = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const size_t a = i + k, b = i + k + len / 2;
        const double tr = re[b] * cur_r - im[b] * cur_i;
        const double ti = re[b] * cur_i + im[b] * cur_r;
        re[b] = re[a] - tr;
        im[b] = im[a] - ti;
        re[a] += tr;
        im[a] += ti;
        const double nr = cur_r * wr - cur_i * wi;
        cur_i = cur_r * wi + cur_i * wr;
        cur_r = nr;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Frame extraction pipeline (feature-window.cc semantics)
// ---------------------------------------------------------------------------
struct FrameOpts {
  double samp_freq = 16000.0;
  double frame_shift_ms = 10.0;
  double frame_length_ms = 25.0;
  double preemph = 0.97;
  bool remove_dc = true;
  // povey window, round_to_power_of_two, snip_edges, dither=0 fixed.

  int WindowSize() const {
    return static_cast<int>(samp_freq * 0.001 * frame_length_ms);
  }
  int WindowShift() const {
    return static_cast<int>(samp_freq * 0.001 * frame_shift_ms);
  }
  int PaddedWindowSize() const {
    int n = 1;
    while (n < WindowSize()) n *= 2;
    return n;
  }
};

int NumFrames(size_t num_samples, const FrameOpts& o) {
  const size_t win = static_cast<size_t>(o.WindowSize());
  if (num_samples < win) return 0;  // snip_edges
  return 1 + static_cast<int>((num_samples - win) / o.WindowShift());
}

std::vector<double> PoveyWindow(int n) {
  std::vector<double> w(n);
  const double a = 2.0 * kPi / (n - 1);
  for (int i = 0; i < n; ++i)
    w[i] = std::pow(0.5 - 0.5 * std::cos(a * i), 0.85);
  return w;
}

// One frame: dc-removal, raw log energy, preemphasis (in REVERSE order,
// x[0] -= c*x[0]), povey window. Returns raw log energy.
double ProcessWindow(std::vector<double>* frame, const FrameOpts& o,
                     const std::vector<double>& window) {
  std::vector<double>& x = *frame;
  const int n = static_cast<int>(x.size());
  if (o.remove_dc) {
    double mean = 0.0;
    for (double v : x) mean += v;
    mean /= n;
    for (double& v : x) v -= mean;
  }
  double energy = 0.0;
  for (double v : x) energy += v * v;
  const double log_energy = std::log(std::max(energy, kFloor));
  if (o.preemph != 0.0) {
    for (int i = n - 1; i > 0; --i) x[i] -= o.preemph * x[i - 1];
    x[0] -= o.preemph * x[0];
  }
  for (int i = 0; i < n; ++i) x[i] *= window[i];
  return log_energy;
}

// Power spectrum of one processed frame, zero-padded to nfft.
std::vector<double> PowerSpectrum(const std::vector<double>& frame,
                                  int nfft) {
  std::vector<double> re(nfft, 0.0), im(nfft, 0.0);
  std::copy(frame.begin(), frame.end(), re.begin());
  Fft(re, im);
  std::vector<double> power(nfft / 2 + 1);
  for (int k = 0; k <= nfft / 2; ++k)
    power[k] = re[k] * re[k] + im[k] * im[k];
  return power;
}

// ---------------------------------------------------------------------------
// Mel banks + DCT + lifter (mel-computations.cc / feature-mfcc.cc)
// ---------------------------------------------------------------------------
double MelScale(double freq) { return 1127.0 * std::log1p(freq / 700.0); }

std::vector<std::vector<double>> MelBanks(int num_bins, double low_freq,
                                          double high_freq_off,
                                          const FrameOpts& o) {
  const int nfft = o.PaddedWindowSize();
  const double nyquist = 0.5 * o.samp_freq;
  const double high_freq =
      high_freq_off > 0.0 ? high_freq_off : nyquist + high_freq_off;
  const double fft_bin_width = o.samp_freq / nfft;
  const double mel_low = MelScale(low_freq), mel_high = MelScale(high_freq);
  const double delta = (mel_high - mel_low) / (num_bins + 1);
  const int num_fft_bins = nfft / 2 + 1;

  std::vector<std::vector<double>> banks(
      num_bins, std::vector<double>(num_fft_bins, 0.0));
  for (int b = 0; b < num_bins; ++b) {
    const double left = mel_low + b * delta;
    const double center = mel_low + (b + 1) * delta;
    const double right = mel_low + (b + 2) * delta;
    for (int i = 0; i < num_fft_bins; ++i) {
      const double mel = MelScale(fft_bin_width * i);
      if (mel > left && mel < right)
        banks[b][i] = mel <= center ? (mel - left) / (center - left)
                                    : (right - mel) / (right - center);
    }
  }
  return banks;
}

std::vector<std::vector<double>> DctMatrix(int num_ceps, int num_bins) {
  std::vector<std::vector<double>> m(num_ceps,
                                     std::vector<double>(num_bins));
  for (int j = 0; j < num_bins; ++j) m[0][j] = std::sqrt(1.0 / num_bins);
  for (int k = 1; k < num_ceps; ++k)
    for (int j = 0; j < num_bins; ++j)
      m[k][j] = std::sqrt(2.0 / num_bins) *
                std::cos(kPi * k * (j + 0.5) / num_bins);
  return m;
}

// ---------------------------------------------------------------------------
// Feature computations
// ---------------------------------------------------------------------------
std::vector<std::vector<double>> ComputeSpectrogram(
    const std::vector<double>& wave, const FrameOpts& o) {
  const int n_frames = NumFrames(wave.size(), o);
  const int win = o.WindowSize(), shift = o.WindowShift();
  const int nfft = o.PaddedWindowSize();
  const std::vector<double> window = PoveyWindow(win);
  std::vector<std::vector<double>> feats;
  feats.reserve(n_frames);
  for (int t = 0; t < n_frames; ++t) {
    std::vector<double> frame(wave.begin() + t * shift,
                              wave.begin() + t * shift + win);
    const double log_energy = ProcessWindow(&frame, o, window);
    std::vector<double> power = PowerSpectrum(frame, nfft);
    std::vector<double> row(power.size());
    for (size_t k = 0; k < power.size(); ++k)
      row[k] = std::log(std::max(power[k], kFloor));
    row[0] = log_energy;  // raw_energy=true default
    feats.push_back(std::move(row));
  }
  return feats;
}

std::vector<std::vector<double>> ComputeMfccHires(
    const std::vector<double>& wave, const FrameOpts& o) {
  const int kBins = 40, kCeps = 40;
  const double kLifter = 22.0;
  const int n_frames = NumFrames(wave.size(), o);
  const int win = o.WindowSize(), shift = o.WindowShift();
  const int nfft = o.PaddedWindowSize();
  const std::vector<double> window = PoveyWindow(win);
  const auto banks = MelBanks(kBins, 20.0, -400.0, o);
  const auto dct = DctMatrix(kCeps, kBins);
  std::vector<double> lifter(kCeps);
  for (int k = 0; k < kCeps; ++k)
    lifter[k] = 1.0 + 0.5 * kLifter * std::sin(kPi * k / kLifter);

  std::vector<std::vector<double>> feats;
  feats.reserve(n_frames);
  for (int t = 0; t < n_frames; ++t) {
    std::vector<double> frame(wave.begin() + t * shift,
                              wave.begin() + t * shift + win);
    ProcessWindow(&frame, o, window);  // use_energy=false: energy unused
    const std::vector<double> power = PowerSpectrum(frame, nfft);
    std::vector<double> log_mel(kBins);
    for (int b = 0; b < kBins; ++b) {
      double e = 0.0;
      for (size_t i = 0; i < power.size(); ++i) e += banks[b][i] * power[i];
      log_mel[b] = std::log(std::max(e, kFloor));
    }
    std::vector<double> row(kCeps);
    for (int k = 0; k < kCeps; ++k) {
      double c = 0.0;
      for (int b = 0; b < kBins; ++b) c += dct[k][b] * log_mel[b];
      row[k] = c * lifter[k];
    }
    feats.push_back(std::move(row));
  }
  return feats;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s (spectrogram|mfcc) wave.f32le out.mat "
                 "[samp_freq]\n",
                 argv[0]);
    return 2;
  }
  const std::string mode = argv[1];
  FrameOpts opts;
  if (argc > 4) opts.samp_freq = std::atof(argv[4]);

  FILE* f = std::fopen(argv[2], "rb");
  if (!f) {
    std::perror("open wave");
    return 2;
  }
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<float> raw(bytes / 4);
  if (std::fread(raw.data(), 4, raw.size(), f) != raw.size()) {
    std::fprintf(stderr, "short read\n");
    return 2;
  }
  std::fclose(f);
  std::vector<double> wave(raw.begin(), raw.end());

  std::vector<std::vector<double>> feats;
  if (mode == "spectrogram") {
    feats = ComputeSpectrogram(wave, opts);
  } else if (mode == "mfcc") {
    feats = ComputeMfccHires(wave, opts);
  } else {
    std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
  }

  FILE* out = std::fopen(argv[3], "wb");
  if (!out) {
    std::perror("open out");
    return 2;
  }
  const int32_t rows = static_cast<int32_t>(feats.size());
  const int32_t cols = rows ? static_cast<int32_t>(feats[0].size()) : 0;
  std::fwrite(&rows, 4, 1, out);
  std::fwrite(&cols, 4, 1, out);
  for (const auto& row : feats) {
    std::vector<float> frow(row.begin(), row.end());
    std::fwrite(frow.data(), 4, frow.size(), out);
  }
  std::fclose(out);
  return 0;
}
