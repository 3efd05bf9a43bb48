"""Data layer tests: WAV codec, datafile parsing, sampler statistics,
host loader batches (SURVEY.md §4c)."""

import json

import numpy as np
import pytest

from psla_tpu.data import (
    AudioLoader,
    LoaderConfig,
    UniformSampler,
    WeightedSampler,
    compute_sample_weights,
    gen_weight_file,
    load_datafile,
    make_index_dict,
    make_name_dict,
    read_wav,
    write_wav,
)
from tests.synth import build_corpus


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    wav = (rng.rand(12345).astype(np.float32) * 1.6 - 0.8)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 16000)
    got, sr = read_wav(path)
    assert sr == 16000
    assert got.shape == wav.shape
    # PCM16 quantization + write-scale 32767 vs read-scale 32768 asymmetry
    assert np.max(np.abs(got - wav)) < 2.0 / 32768


def test_wav_matches_scipy_reader(tmp_path):
    from scipy.io import wavfile

    rng = np.random.RandomState(1)
    wav = (rng.rand(4096) * 1.8 - 0.9).astype(np.float32)
    path = str(tmp_path / "y.wav")
    write_wav(path, wav, 22050)
    sr, ref = wavfile.read(path)
    got, sr2 = read_wav(path)
    assert sr == sr2 == 22050
    np.testing.assert_allclose(got, ref.astype(np.float32) / 32768.0, atol=0)


def test_wav_stereo_takes_first_channel(tmp_path):
    import struct

    sr = 8000
    left = np.round(np.sin(np.arange(100)) * 1000).astype("<i2")
    right = np.zeros(100, dtype="<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2] = left
    inter[1::2] = right
    raw = inter.tobytes()
    path = str(tmp_path / "st.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16))
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)
    got, _ = read_wav(path)
    np.testing.assert_allclose(got, left.astype(np.float32) / 32768.0)


def test_decode_wav_malformed_bytes_raise_valueerror(tmp_path):
    """serve.py feeds UNTRUSTED request bodies to decode_wav: every
    malformed input (random bytes, plausible-RIFF prefixes, truncations
    of a real file) must raise ValueError — never an uncontrolled
    exception type, never garbage output."""
    from psla_tpu.data.wav import decode_wav, write_wav

    rng = np.random.default_rng(0)
    for i in range(300):
        n = int(rng.integers(0, 300))
        blob = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        if i % 3 == 0:  # bias toward plausible RIFF headers
            blob = b"RIFF" + blob[:8] + b"WAVE" + blob[12:]
        with pytest.raises(ValueError):
            decode_wav(blob)
    # truncations of a real PCM16 file either decode a prefix or raise
    tmp = str(tmp_path / "clip.wav")
    write_wav(tmp, np.linspace(-0.5, 0.5, 1000, dtype=np.float32), 16000)
    blob = open(tmp, "rb").read()
    for cut in range(0, len(blob), 13):
        try:
            wav, sr = decode_wav(blob[:cut])
            assert sr == 16000 and wav.dtype == np.float32
        except ValueError:
            pass


def test_datafile_parsing(tmp_path):
    datafile, label_csv = build_corpus(str(tmp_path), num_classes=3, clips_per_class=2)
    df = load_datafile(datafile, label_csv)
    assert df.num_classes == 3
    assert len(df) == 6
    assert make_index_dict(label_csv)["/m/00001"] == 1
    assert make_name_dict(label_csv)[2] == "class 2"
    mh = df.multi_hot(0)
    assert mh.shape == (3,)
    assert mh.sum() >= 1
    assert df.label_matrix().shape == (6, 3)


def test_weight_formula(tmp_path):
    """sample_weight[i] = sum_c 1000/(count_c + 0.01) over the clip's labels
    (gen_weight_file.py:50-58)."""
    datafile = tmp_path / "d.json"
    label_csv = tmp_path / "l.csv"
    label_csv.write_text(
        "index,mid,display_name\n0,/m/a,a\n1,/m/b,b\n2,/m/c,c\n"
    )
    entries = [
        {"wav": "w0", "labels": "/m/a"},
        {"wav": "w1", "labels": "/m/a"},
        {"wav": "w2", "labels": "/m/a,/m/b"},
        {"wav": "w3", "labels": "/m/c"},
    ]
    datafile.write_text(json.dumps({"data": entries}))
    df = load_datafile(str(datafile), str(label_csv))
    w = compute_sample_weights(df)
    wa = 1000.0 / (3 + 0.01)
    wb = 1000.0 / (1 + 0.01)
    wc = 1000.0 / (1 + 0.01)
    np.testing.assert_allclose(w, [wa, wa, wa + wb, wc], rtol=1e-12)

    out = gen_weight_file(str(datafile), str(label_csv))
    assert out.endswith("d_weight.csv")
    np.testing.assert_allclose(np.loadtxt(out, delimiter=","), w, rtol=1e-8)


def test_weighted_sampler_distribution():
    w = np.array([1.0, 1.0, 8.0])
    s = WeightedSampler(w, seed=0)
    draws = s.epoch(40000)
    freq = np.bincount(draws, minlength=3) / 40000
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.01)


def test_uniform_sampler_is_permutation():
    s = UniformSampler(10, seed=0)
    e = s.epoch()
    assert sorted(e.tolist()) == list(range(10))


def test_uniform_sampler_multihost_partitions_global_permutation():
    """bal=False multi-host (DistributedSampler semantics): hosts with the
    same seed stride one global permutation — disjoint shards that jointly
    cover the dataset, per epoch."""
    shards = [
        UniformSampler(10, seed=5, host_id=h, num_hosts=2).epoch(5, epoch=3)
        for h in (0, 1)
    ]
    assert all(len(s) == 5 for s in shards)
    assert not set(shards[0]) & set(shards[1])
    assert set(shards[0]) | set(shards[1]) == set(range(10))
    # different epochs reshuffle
    again = UniformSampler(10, seed=5, host_id=0, num_hosts=2).epoch(5, epoch=4)
    assert set(again.tolist()) != set(shards[0].tolist()) or not np.array_equal(
        again, shards[0]
    )


def test_loader_batches(tmp_path):
    datafile, label_csv = build_corpus(
        str(tmp_path), num_classes=3, clips_per_class=3, seconds=0.5
    )
    df = load_datafile(datafile, label_csv)
    cfg = LoaderConfig(
        batch_size=4, buffer_samples=8000, num_workers=2, mixup=True,
        drop_remainder=False,
    )
    loader = AudioLoader(df, cfg, weights=compute_sample_weights(df))
    batches = list(loader)
    assert len(batches) == 3  # 9 samples, bs 4, padded final batch
    b = batches[0]
    assert b["wav"].shape == (4, 8000)
    assert b["labels"].shape == (4, 3)
    assert b["mix_wav"].shape == (4, 8000)
    assert b["length"].max() <= 8000
    assert batches[-1]["n_valid"] == 1
    # full-clip mean matches decoding directly
    path_mean = b["wav_mean"][0]
    assert np.isfinite(path_mean)


def test_loader_eval_sequential_sharding(tmp_path):
    datafile, label_csv = build_corpus(
        str(tmp_path), num_classes=2, clips_per_class=5, seconds=0.3
    )
    df = load_datafile(datafile, label_csv)
    seen = []
    for host in range(2):
        cfg = LoaderConfig(
            batch_size=2, buffer_samples=4800, num_workers=1,
            drop_remainder=False, host_id=host, num_hosts=2,
        )
        loader = AudioLoader(df, cfg, shuffle=False)
        for b in loader:
            seen.extend(b["labels"][: b["n_valid"]].argmax(1).tolist())
    # both hosts together cover all 10 clips exactly once
    assert len(seen) == 10


def test_loader_eval_sharding_equal_batch_counts(tmp_path):
    """Sequential multi-host shards must yield IDENTICAL batch counts on
    every host (multi-host validate issues collectives per batch; a host
    exiting the loop early deadlocks the pod). Surplus slots are emitted
    as padding with n_valid < batch_size, possibly n_valid == 0."""
    datafile, label_csv = build_corpus(
        str(tmp_path), num_classes=1, clips_per_class=9, seconds=0.3,
    )
    df = load_datafile(datafile, label_csv)  # n=9
    counts, valids = [], []
    for host in range(2):
        cfg = LoaderConfig(
            batch_size=4, buffer_samples=4800, num_workers=1,
            drop_remainder=False, host_id=host, num_hosts=2,
        )
        loader = AudioLoader(df, cfg, shuffle=False)
        assert loader.batches_per_epoch() == 2  # ceil(ceil(9/2)/4) both
        batches = list(loader)
        counts.append(len(batches))
        valids.append([int(b["n_valid"]) for b in batches])
    assert counts == [2, 2]
    # host 0 has 5 rows (4+1), host 1 has 4 rows (4+0-valid pad batch)
    assert valids[0] == [4, 1]
    assert valids[1] == [4, 0]


def test_loader_abandoned_iteration_stops_producer(tmp_path):
    """Breaking out of iteration early must not leave the producer thread
    blocked in q.put forever (NaN-abort / early-exit path)."""
    import threading
    import time as _time

    datafile, label_csv = build_corpus(
        str(tmp_path), num_classes=2, clips_per_class=8, seconds=0.3
    )
    df = load_datafile(datafile, label_csv)

    def producer_threads():
        return [
            t for t in threading.enumerate()
            if t.name == "psla-loader-producer" and t.is_alive()
        ]

    loader = AudioLoader(
        df,
        LoaderConfig(batch_size=2, buffer_samples=4800, num_workers=1,
                     prefetch=1),
    )
    for _ in range(3):
        for batch in loader:
            break  # abandon immediately with the queue full
    deadline = _time.time() + 5.0
    while producer_threads() and _time.time() < deadline:
        _time.sleep(0.05)
    assert not producer_threads(), "producer thread(s) leaked after break"
