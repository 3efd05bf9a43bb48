"""Pure-numpy reference implementation of the kaldi log-mel filterbank.

This is the *golden oracle* for the JAX/Pallas frontend tests. It is an
independent implementation of the Kaldi `compute-fbank-feats` algorithm with
the exact options the PSLA reference passes to
``torchaudio.compliance.kaldi.fbank`` (reference:
src/dataloaders/audioset_dataset.py:119-120):

    htk_compat=True, sample_frequency=sr, use_energy=False,
    window_type='hanning', num_mel_bins=128, dither=0.0, frame_shift=10

plus the kaldi defaults that matter:

    frame_length=25ms, round_to_power_of_two=True, snip_edges=True,
    remove_dc_offset=True, preemphasis_coefficient=0.97, use_power=True,
    low_freq=20, high_freq=0 (-> nyquist), subtract_mean=False

Note: with ``use_energy=False``, ``htk_compat`` has no observable effect
(it only relocates the energy column), so it does not appear below.

Kept deliberately slow and obvious — per-frame loops, float64-free float32
arithmetic mirroring the torch op order — so it can serve as a trustworthy
golden for the fast on-device path.
"""

from __future__ import annotations

import numpy as np

# float32 machine epsilon: the log floor used by kaldi/torchaudio.
EPSILON = np.float32(np.finfo(np.float32).eps)


def mel_scale(freq):
    """Kaldi mel scale: 1127 * ln(1 + f/700)."""
    return 1127.0 * np.log1p(np.asarray(freq, dtype=np.float64) / 700.0)


def next_power_of_2(n: int) -> int:
    return 1 if n == 0 else 2 ** (int(n) - 1).bit_length()


def mel_banks_numpy(
    num_bins: int,
    padded_window_size: int,
    sample_freq: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Triangular kaldi mel filterbank, shape [num_bins, padded_window_size//2 + 1].

    The final column (nyquist bin) is zero, matching the torchaudio behaviour
    of computing banks over ``padded_window_size // 2`` FFT bins and
    zero-padding one column.
    """
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist

    num_fft_bins = padded_window_size // 2
    fft_bin_width = sample_freq / padded_window_size

    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = mel_low + (bin_idx + 1.0) * mel_delta
    right_mel = mel_low + (bin_idx + 2.0) * mel_delta

    mel = mel_scale(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    banks = np.maximum(0.0, np.minimum(up_slope, down_slope))

    out = np.zeros((num_bins, num_fft_bins + 1), dtype=np.float32)
    out[:, :num_fft_bins] = banks.astype(np.float32)
    return out


def _window(window_type: str, window_size: int) -> np.ndarray:
    n = np.arange(window_size, dtype=np.float64)
    if window_type == "hanning":
        # symmetric (periodic=False) hann window
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (window_size - 1))
    elif window_type == "povey":
        w = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / (window_size - 1))) ** 0.85
    elif window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / (window_size - 1))
    elif window_type == "rectangular":
        w = np.ones(window_size)
    else:
        raise ValueError(f"unknown window type {window_type!r}")
    return w.astype(np.float32)


def fbank_numpy(
    waveform: np.ndarray,
    sample_frequency: float = 16000.0,
    num_mel_bins: int = 128,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    window_type: str = "hanning",
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Log-mel fbank of a 1-D waveform. Returns [num_frames, num_mel_bins] f32."""
    wav = np.asarray(waveform, dtype=np.float32).reshape(-1)
    window_size = int(sample_frequency * frame_length_ms * 0.001)
    window_shift = int(sample_frequency * frame_shift_ms * 0.001)
    padded = next_power_of_2(window_size)

    n = wav.shape[0]
    if n < window_size:
        return np.zeros((0, num_mel_bins), dtype=np.float32)
    m = 1 + (n - window_size) // window_shift

    win = _window(window_type, window_size)
    banks = mel_banks_numpy(num_mel_bins, padded, sample_frequency, low_freq, high_freq)

    out = np.empty((m, num_mel_bins), dtype=np.float32)
    for t in range(m):
        frame = wav[t * window_shift : t * window_shift + window_size].copy()
        if remove_dc_offset:
            frame = frame - frame.mean(dtype=np.float32)
        if preemphasis_coefficient != 0.0:
            prev = np.concatenate([frame[:1], frame[:-1]])
            frame = frame - np.float32(preemphasis_coefficient) * prev
        frame = frame * win
        padded_frame = np.zeros(padded, dtype=np.float32)
        padded_frame[:window_size] = frame
        spec = np.fft.rfft(padded_frame.astype(np.float64))
        power = (spec.real.astype(np.float32) ** 2 + spec.imag.astype(np.float32) ** 2)
        mel = banks @ power
        out[t] = np.log(np.maximum(mel, EPSILON))
    return out
