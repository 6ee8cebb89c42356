"""Generate golden fixtures for the windowed-sinc resampler parity test.

torchaudio is not installed in this environment, so the fixtures are NOT
torchaudio output: they come from an *independent* float64 oracle below —
a direct per-output-sample evaluation of the continuous-time windowed-sinc
resampling definition that torchaudio's `sinc_interp_hann` implements
(lowpass at rolloff*min(sr), Hann^2 window of `width` zero-crossings,
kernel gain base_freq/orig):

    y(t_i) = (f0/orig) * sum_n x[n] * w(f0*(n/orig - t_i)) * sinc(f0*(n/orig - t_i))

evaluated at t_i = i/new on the gcd-reduced rate pair.  The oracle shares
no code or loop structure with mgsv_tpu.data.audio.resample_sinc (which is
a vectorized polyphase/strided-correlation formulation), so agreement
within 1e-4 is evidence of correctness, not a tautology.  When torchaudio
IS available the importorskip'd test still compares against it directly.

Run from the repo root:  python tests/fixtures/make_resample_fixtures.py
"""

import math
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

PAIRS = [(44100, 16000), (48000, 16000), (22050, 16000), (8000, 16000)]


def oracle_resample(wav, orig_sr, new_sr, lowpass_filter_width=6, rolloff=0.99):
    g = math.gcd(int(orig_sr), int(new_sr))
    orig, new = orig_sr // g, new_sr // g
    f0 = min(orig, new) * rolloff
    support = lowpass_filter_width / f0          # kernel half-width, seconds

    x = np.asarray(wav, np.float64)
    n_in = len(x)
    n_out = int(math.ceil(new * n_in / orig))
    y = np.empty(n_out, np.float64)
    n_idx = np.arange(n_in, dtype=np.float64)
    for i in range(n_out):
        ti = i / new
        # input samples whose kernel support covers t_i
        lo = max(0, int(math.floor((ti - support) * orig)))
        hi = min(n_in, int(math.ceil((ti + support) * orig)) + 1)
        tau = f0 * (n_idx[lo:hi] / orig - ti)
        tau = np.clip(tau, -lowpass_filter_width, lowpass_filter_width)
        window = np.cos(np.pi * tau / (2 * lowpass_filter_width)) ** 2
        pt = np.pi * tau
        sinc = np.where(pt == 0, 1.0, np.sin(pt) / np.where(pt == 0, 1.0, pt))
        y[i] = (f0 / orig) * np.dot(x[lo:hi], sinc * window)
    return y.astype(np.float32)


def test_waveform(orig_sr):
    """Same recipe as test_resample_sinc_matches_torchaudio."""
    rng = np.random.RandomState(0)
    t = np.arange(int(orig_sr * 1.3)) / orig_sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 3213 * t)
            + 0.05 * rng.randn(len(t))).astype(np.float32)


def main():
    for orig_sr, new_sr in PAIRS:
        wav = test_waveform(orig_sr)
        out = oracle_resample(wav, orig_sr, new_sr)
        path = os.path.join(HERE, f"resample_{orig_sr}_{new_sr}.npy")
        np.save(path, out)
        print(path, out.shape, out.dtype)


if __name__ == "__main__":
    main()
