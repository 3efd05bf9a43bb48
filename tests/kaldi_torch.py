"""Second INDEPENDENT kaldi-fbank oracle, in torch (round-1 verdict #2/weak-2).

Implements ``torchaudio.compliance.kaldi.fbank`` semantics (the reference's
numerics source of truth, src/dataloaders/audioset_dataset.py:119-120)
directly from the documented Kaldi compute-fbank-feats algorithm, using
torch primitives end to end — vectorized strided framing,
``torch.hann_window``, torch f32 rfft — i.e. a different window-coefficient
path, a different FFT, and a different accumulation order than
psla_tpu/frontend/kaldi_numpy.py (per-frame loops, hand-rolled window,
numpy f64 rfft).

Two implementations written independently against the same spec agreeing
to float noise bounds the risk that the golden oracle misreads a Kaldi
detail (window symmetry, preemphasis edge, log floor); the DIRECT
torchaudio comparison (tests/test_fbank_grounding.py) runs wherever
torchaudio is importable, which this machine is not (zero-egress, no
wheel on disk).

Options fixed to the reference call: htk_compat=True (no-op without
use_energy), use_energy=False, window_type='hanning', num_mel_bins
configurable, dither=0.0, frame_shift=10ms; kaldi defaults
frame_length=25ms, round_to_power_of_two=True, snip_edges=True,
remove_dc_offset=True, preemphasis=0.97, use_power=True, low=20,
high=nyquist.
"""

from __future__ import annotations

import math

import torch


def _mel(f):
    return 1127.0 * torch.log1p(torch.as_tensor(f, dtype=torch.float64) / 700.0)


def kaldi_torch_mel_banks(
    num_bins: int,
    padded_window_size: int,
    sample_freq: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> torch.Tensor:
    """[num_bins, padded//2 + 1] triangular banks (last column zero)."""
    if high_freq <= 0.0:
        high_freq = 0.5 * sample_freq + high_freq
    num_fft_bins = padded_window_size // 2
    fft_bin_width = sample_freq / padded_window_size
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bin_idx = torch.arange(num_bins, dtype=torch.float64).unsqueeze(1)
    left = mel_low + bin_idx * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    mel = _mel(fft_bin_width * torch.arange(num_fft_bins, dtype=torch.float64))
    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    banks = torch.clamp(torch.minimum(up, down), min=0.0).to(torch.float32)
    return torch.nn.functional.pad(banks, (0, 1))


def kaldi_torch_fbank(
    waveform,
    sample_frequency: float = 16000.0,
    num_mel_bins: int = 128,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
) -> torch.Tensor:
    """[num_frames, num_mel_bins] f32 log-mels of a 1-D waveform."""
    wav = torch.as_tensor(waveform, dtype=torch.float32).reshape(-1)
    window_size = int(sample_frequency * frame_length_ms * 0.001)
    window_shift = int(sample_frequency * frame_shift_ms * 0.001)
    padded = 2 ** math.ceil(math.log2(window_size))
    n = wav.numel()
    if n < window_size:
        return torch.zeros(0, num_mel_bins)
    # snip-edges strided framing
    m = 1 + (n - window_size) // window_shift
    frames = wav.as_strided((m, window_size), (window_shift, 1)).clone()
    # per-frame DC removal
    frames = frames - frames.mean(dim=1, keepdim=True)
    # preemphasis, first sample offset-padded with itself
    prev = torch.cat([frames[:, :1], frames[:, :-1]], dim=1)
    frames = frames - 0.97 * prev
    # symmetric hann window (torchaudio: torch.hann_window(periodic=False))
    frames = frames * torch.hann_window(window_size, periodic=False)
    # zero-pad to the power-of-two FFT size; power spectrum
    frames = torch.nn.functional.pad(frames, (0, padded - window_size))
    power = torch.fft.rfft(frames).abs().pow(2.0)
    banks = kaldi_torch_mel_banks(num_mel_bins, padded, sample_frequency)
    mel = power @ banks.t()
    return torch.log(torch.clamp(mel, min=torch.finfo(torch.float32).eps))
