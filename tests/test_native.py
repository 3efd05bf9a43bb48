"""Native C++ WAV batch decoder (csrc/wavio.cc) vs the numpy golden.

The native decoder must be bit-exact with psla_tpu/data/wav.py across all
supported encodings (PCM 8/16/24/32, IEEE float32, multichannel) and must
reproduce the loader's full-clip mean / truncated-length semantics
(reference behavior: torchaudio.load + waveform[0] + mean subtraction,
src/dataloaders/audioset_dataset.py:91-100).
"""

import os
import struct

import numpy as np
import pytest

from psla_tpu.data import native
from psla_tpu.data.wav import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder unavailable (no g++?)"
)


def _write_fmt(path, w, fmt):
    n = len(w)
    if fmt == "f32":
        raw = w.astype("<f4").tobytes()
        code, bits, ch = 3, 32, 1
    elif fmt == "f64":
        raw = w.astype("<f8").tobytes()
        code, bits, ch = 3, 64, 1
    elif fmt == "pcm24":
        v = np.round(np.clip(w, -1, 1) * 8388607).astype(np.int64)
        b = np.zeros((n, 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        raw = b.tobytes()
        code, bits, ch = 1, 24, 1
    elif fmt == "pcm8":
        raw = (np.round(np.clip(w, -1, 1) * 127) + 128).astype(np.uint8).tobytes()
        code, bits, ch = 1, 8, 1
    elif fmt == "pcm32":
        raw = np.round(np.clip(w, -1, 1) * 2147483000).astype("<i4").tobytes()
        code, bits, ch = 1, 32, 1
    elif fmt == "stereo16":
        s = np.stack([w, -w], 1)
        raw = np.round(np.clip(s, -1, 1) * 32767).astype("<i2").tobytes()
        code, bits, ch = 1, 16, 2
    else:
        raise ValueError(fmt)
    block = ch * bits // 8
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE" + b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, code, ch, 16000, 16000 * block, block, bits))
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)


def test_batch_decode_bit_exact(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(6):
        n = int(rng.integers(1000, 50_000))
        w = (rng.standard_normal(n) * 0.3).clip(-1, 1)
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, w, 16000)
        paths.append(p)

    buf = 30_000
    out, means, lengths = native.decode_batch(paths, buf, n_threads=4)
    for i, p in enumerate(paths):
        gold, _sr = read_wav(p)
        n = min(gold.size, buf)
        ref = np.zeros(buf, np.float32)
        ref[:n] = gold[:n]
        assert lengths[i] == n
        assert np.array_equal(out[i], ref)
        # mean is over the FULL clip even when truncated into the buffer
        assert abs(means[i] - np.float32(gold.mean())) < 2e-7


@pytest.mark.parametrize("fmt", ["f32", "f64", "pcm24", "pcm8", "pcm32",
                                 "stereo16"])
def test_formats_bit_exact(tmp_path, fmt):
    rng = np.random.default_rng(hash(fmt) % 2**31)
    w = (rng.standard_normal(5000) * 0.3).clip(-1, 1)
    p = str(tmp_path / f"{fmt}.wav")
    _write_fmt(p, w, fmt)
    gold, _sr = read_wav(p)
    out, means, lengths = native.decode_batch([p], 6000)
    assert lengths[0] == gold.size
    assert np.array_equal(out[0][: gold.size], gold)
    assert np.all(out[0][gold.size :] == 0.0)


def test_decode_one_reports_rate(tmp_path):
    w = np.linspace(-0.5, 0.5, 4000, dtype=np.float32)
    p = str(tmp_path / "r.wav")
    write_wav(p, w, 32000)
    out, mean, length, rate = native.decode_one(p, 5000)
    assert rate == 32000 and length == 4000
    gold, sr = read_wav(p)
    assert sr == 32000
    assert np.array_equal(out[:4000], gold)


def test_missing_file_raises(tmp_path):
    with pytest.raises(RuntimeError):
        native.decode_batch([str(tmp_path / "nope.wav")], 100)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_resample_batch_matches_scipy(tmp_path):
    """Native polyphase resampler (csrc/resample.cc) vs the scipy path:
    same filter (taps designed Python-side), same output length, samples
    within 1 PCM16 LSB (f32-vs-f64 accumulation at rounding boundaries)."""
    from psla_tpu.tools.prep_fsd import resample_to_16k

    rng = np.random.default_rng(0)
    cases = [(44100, 66150), (48000, 96000), (22050, 22051), (44100, 441)]
    srcs, dsts, refs = [], [], []
    for j, (sr, n) in enumerate(cases):
        wav = np.clip(0.5 * rng.standard_normal(n), -1, 1).astype(np.float32)
        s = str(tmp_path / f"in{j}.wav")
        write_wav(s, wav, sr)
        srcs.append(s)
        dsts.append(str(tmp_path / f"out{j}.wav"))
        r = str(tmp_path / f"ref{j}.wav")
        resample_to_16k(s, r)
        refs.append(r)

    # 44.1k batch: matching files resampled, others flagged for fallback
    status = native.resample_batch(srcs, dsts, 44100, 16000, n_threads=4)
    assert status[0] == 0 and status[3] == 0
    assert status[1] == native.RATE_MISMATCH
    assert status[2] == native.RATE_MISMATCH

    def check(j):
        got, r1 = read_wav(dsts[j])
        ref, r2 = read_wav(refs[j])
        assert r1 == r2 == 16000
        assert got.shape == ref.shape
        assert np.max(np.abs(got - ref)) * 32767 <= 1.0

    check(0)
    check(3)
    for j, rate in ((1, 48000), (2, 22050)):
        st = native.resample_batch([srcs[j]], [dsts[j]], rate, 16000)
        assert st[0] == 0
        check(j)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_resample_dir_uses_native_with_fallback(tmp_path):
    """prep_fsd.resample_dir: native fast path plus scipy fallback for
    files at an unexpected rate, identical outputs either way."""
    from psla_tpu.tools import prep_fsd

    rng = np.random.default_rng(1)
    src = tmp_path / "src"
    src.mkdir()
    write_wav(
        str(src / "a.wav"),
        np.clip(0.5 * rng.standard_normal(44100), -1, 1), 44100,
    )
    write_wav(
        str(src / "b.wav"),
        np.clip(0.5 * rng.standard_normal(48000), -1, 1), 48000,
    )
    dst = tmp_path / "dst"
    prep_fsd.resample_dir(str(src), str(dst))
    for name, n_out in (("a.wav", 16000), ("b.wav", 16000)):
        got, rate = read_wav(str(dst / name))
        assert rate == 16000 and len(got) == n_out


# ----------------------------------------------------------- int16 wire


def test_batch_decode_i16_pcm16_is_raw_copy(tmp_path):
    """PCM16 sources on the int16 wire: raw samples, padding zeros, and
    the identical full-clip float mean as the float32 decode."""
    rng = np.random.default_rng(5)
    paths, raws = [], []
    for i in range(4):
        n = int(rng.integers(1000, 40_000))
        w = (rng.standard_normal(n) * 0.3).clip(-1, 1)
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, w, 16000)
        paths.append(p)
        with open(p, "rb") as f:
            data = f.read()
        raws.append(np.frombuffer(data[44:], dtype="<i2"))

    buf = 30_000
    qi, mi, li = native.decode_batch(paths, buf, n_threads=2, wire="int16")
    qf, mf, lf = native.decode_batch(paths, buf, n_threads=2)
    assert qi.dtype == np.int16
    np.testing.assert_array_equal(mi, mf)
    np.testing.assert_array_equal(li, lf)
    for i, raw in enumerate(raws):
        n = min(raw.size, buf)
        assert np.array_equal(qi[i][:n], raw[:n])
        assert np.all(qi[i][n:] == 0)
        # dequantize reproduces the float32 path bit-for-bit
        assert np.array_equal(qi[i].astype(np.float32) / 32768.0, qf[i])


@pytest.mark.parametrize("fmt", ["f32", "f64", "pcm24", "pcm8", "pcm32",
                                 "stereo16"])
def test_i16_wire_matches_python_quantize(tmp_path, fmt):
    """Non-PCM16 formats quantize on the wire exactly like the numpy
    fallback (round-half-to-even + clamp, data/loader.py quantize_pcm16)."""
    from psla_tpu.data.loader import quantize_pcm16

    rng = np.random.default_rng(hash(fmt) % 2**31 + 9)
    w = (rng.standard_normal(5000) * 0.4).clip(-1, 1)
    p = str(tmp_path / f"{fmt}_i16.wav")
    _write_fmt(p, w, fmt)
    out_f, means_f, _ = native.decode_batch([p], 6000)
    out_i, means_i, _ = native.decode_batch([p], 6000, wire="int16")
    np.testing.assert_array_equal(out_i[0], quantize_pcm16(out_f[0]))
    np.testing.assert_array_equal(means_i, means_f)
