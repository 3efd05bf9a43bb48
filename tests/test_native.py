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


@pytest.mark.parametrize("fmt", ["f32", "pcm24", "pcm8", "pcm32", "stereo16"])
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
