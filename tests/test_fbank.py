"""Numerical parity tests: JAX fbank vs the numpy kaldi golden.

The golden (psla_tpu/frontend/kaldi_numpy.py) is an independent
implementation of the exact kaldi options the reference passes to
torchaudio.compliance.kaldi.fbank (src/dataloaders/audioset_dataset.py:119).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from psla_tpu.frontend import fbank as F
from psla_tpu.frontend import kaldi_numpy as R


def _toy_wave(n, seed=0, sr=16000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    wav = (
        0.4 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 1793.0 * t + 0.5)
        + 0.05 * rng.randn(n)
    )
    return wav.astype(np.float32)


def test_num_frames():
    cfg = F.FbankConfig()
    assert cfg.window_size == 400
    assert cfg.window_shift == 160
    assert cfg.padded_window_size == 512
    # 10 s @ 16 kHz -> 998 frames (snip-edges)
    assert cfg.num_frames(160000) == 998
    assert cfg.num_frames(399) == 0
    assert cfg.num_frames(400) == 1
    assert cfg.buffer_length(1056) == 1055 * 160 + 400


def test_mel_banks_shape_and_partition():
    cfg = F.FbankConfig()
    banks = F.mel_banks(cfg)
    assert banks.shape == (128, 257)
    # nyquist column zero (torchaudio pads it)
    assert np.all(banks[:, -1] == 0)
    assert np.all(banks >= 0)
    # every interior FFT bin between low and high freq is covered
    freqs = np.arange(257) * (16000.0 / 512)
    covered = banks.sum(axis=0)
    inside = (freqs > 150) & (freqs < 7800)
    assert np.all(covered[inside] > 0)


@pytest.mark.parametrize("method,tol", [("fft", 2e-4), ("gemm", 5e-4)])
def test_fbank_matches_numpy_golden(method, tol):
    wav = _toy_wave(16000 * 2)  # 2 s
    cfg = F.FbankConfig()
    golden = R.fbank_numpy(wav)
    got = np.asarray(F.fbank(jnp.asarray(wav), config=cfg, method=method))
    assert got.shape == golden.shape == (198, 128)
    err = np.abs(got - golden)
    # Near the float32-eps log floor, log(max(x, eps)) amplifies sub-eps
    # float32 cancellation differences arbitrarily; bins with meaningful
    # energy (log-mel > -10, i.e. power > ~4.5e-5) must meet the tight
    # tolerance, everything else stays within 1e-3.
    energetic = golden > -10.0
    assert energetic.mean() > 0.5  # the test signal must exercise the tight path
    assert np.max(err[energetic]) < tol
    assert np.max(err) < 1e-3


def test_fbank_batched_matches_single():
    cfg = F.FbankConfig()
    wavs = np.stack([_toy_wave(32000, seed=s) for s in range(3)])
    batched = np.asarray(F.fbank(jnp.asarray(wavs), config=cfg))
    for i in range(3):
        single = np.asarray(F.fbank(jnp.asarray(wavs[i]), config=cfg))
        np.testing.assert_allclose(batched[i], single, rtol=0, atol=1e-5)


def test_fbank_batched_lengths_mask():
    """A short clip in a zero-padded buffer must match computing on the
    short clip directly, with trailing frames exactly zero."""
    cfg = F.FbankConfig()
    short = _toy_wave(10000)
    buf = np.zeros(32000, dtype=np.float32)
    buf[:10000] = short
    logmel, valid = F.fbank_batched(
        jnp.asarray(buf[None, :]), jnp.asarray([10000]), config=cfg
    )
    logmel = np.asarray(logmel)
    n_valid = cfg.num_frames(10000)
    assert int(np.asarray(valid).sum()) == n_valid
    direct = np.asarray(F.fbank(jnp.asarray(short), config=cfg))
    np.testing.assert_allclose(logmel[0, :n_valid], direct, rtol=0, atol=1e-5)
    assert np.all(logmel[0, n_valid:] == 0)


def test_fbank_scale_offset_property():
    """Kaldi log-mel of a scaled waveform shifts by 2*log(s) — a strong
    structural check of the power/log chain."""
    wav = _toy_wave(16000)
    a = np.asarray(F.fbank(jnp.asarray(wav)))
    b = np.asarray(F.fbank(jnp.asarray(4.0 * wav)))
    # only where neither value is clamped at the eps log-floor
    ok = a > np.log(np.finfo(np.float32).eps) + 1.0
    np.testing.assert_allclose(
        (b - a)[ok], 2.0 * np.log(4.0), rtol=0, atol=1e-4
    )


def test_gemm_and_fft_paths_agree():
    wav = np.stack([_toy_wave(48000, seed=s) for s in range(2)])
    a = np.asarray(F.fbank(jnp.asarray(wav), method="fft"))
    b = np.asarray(F.fbank(jnp.asarray(wav), method="gemm"))
    assert np.max(np.abs(a - b)) < 2e-3
