"""int16 wire format + device prefetch (round-3 input-path additions).

The reference ships float32 waveform tensors from its DataLoader workers
(src/dataloaders/audioset_dataset.py:91 via torchaudio.load); we add a raw
PCM int16 wire format (half the host->device bytes, bit-exact for PCM16
sources) and a device-side prefetch thread that overlaps the transfer with
compute. These tests pin the exactness and ordering contracts.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from psla_tpu.data import AudioLoader, LoaderConfig, load_datafile
from psla_tpu.data.device_prefetch import prefetch_to_device
from psla_tpu.data.loader import quantize_pcm16
from psla_tpu.frontend.pipeline import PreprocessConfig, preprocess_train
from psla_tpu.train.step import _wav_batch
from tests.synth import build_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("wire_corpus")
    return build_corpus(
        str(root), num_classes=3, clips_per_class=4, seconds=0.5
    )


def _loader(corpus, wire, mixup=True, seed=3, batch_size=4):
    datafile, label_csv = corpus
    df = load_datafile(datafile, label_csv)
    return AudioLoader(
        df,
        LoaderConfig(batch_size=batch_size, buffer_samples=12_000,
                     num_workers=2, mixup=mixup, seed=seed, wire=wire),
    )


def _first_batch(loader, epoch=1):
    loader.set_epoch(epoch)
    it = iter(loader)
    b = next(it)
    it.close()
    return b


def test_quantize_roundtrip_pcm16_exact():
    # every representable PCM16 sample survives the wire bit-exactly
    i = np.arange(-32768, 32768, dtype=np.int32)
    f = i.astype(np.float32) / 32768.0  # the decode normalization
    q = quantize_pcm16(f)
    assert q.dtype == np.int16
    assert (q.astype(np.int32) == i).all()
    assert (q.astype(np.float32) * 2.0 ** -15 == f).all()


def test_loader_int16_wire_bit_exact(corpus):
    bf = _first_batch(_loader(corpus, "float32"))
    bi = _first_batch(_loader(corpus, "int16"))
    for k in ("wav", "mix_wav"):
        assert bi[k].dtype == np.int16
        # synth corpus WAVs are PCM16 -> dequantize reproduces float32 bits
        np.testing.assert_array_equal(
            bi[k].astype(np.float32) * 2.0 ** -15, bf[k]
        )
    for k in ("wav_mean", "length", "labels", "mix_wav_mean", "mix_length",
              "mix_labels", "n_valid"):
        np.testing.assert_array_equal(bi[k], bf[k])


def test_bad_wire_rejected(corpus):
    with pytest.raises(ValueError, match="wire format"):
        _loader(corpus, "bf16")


def test_preprocess_identical_under_wire(corpus):
    """The jitted step's dequantize makes the int16 wire invisible to the
    device math: identical fbank + labels, bit for bit."""
    import jax

    bf = _first_batch(_loader(corpus, "float32"))
    bi = _first_batch(_loader(corpus, "int16"))
    cfg = PreprocessConfig(target_length=64, freq_mask=4, time_mask=4,
                           mixup_rate=0.5, fbank_method="fft")
    key = jax.random.key(7)
    ff, lf = preprocess_train(
        key, _wav_batch({k: v for k, v in bf.items() if k != "n_valid"}), cfg
    )
    fi, li = preprocess_train(
        key, _wav_batch({k: v for k, v in bi.items() if k != "n_valid"}), cfg
    )
    np.testing.assert_array_equal(np.asarray(ff), np.asarray(fi))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(li))


def test_wav_batch_dequantizes_int16():
    wav = (np.arange(8, dtype=np.int16) - 4).reshape(2, 4)
    batch = {
        "wav": jnp.asarray(wav), "wav_mean": jnp.zeros(2),
        "length": jnp.full(2, 4, jnp.int32),
        "labels": jnp.zeros((2, 3)),
        "mix_wav": jnp.asarray(wav), "mix_wav_mean": jnp.zeros(2),
        "mix_length": jnp.full(2, 4, jnp.int32),
        "mix_labels": jnp.zeros((2, 3)),
    }
    wb = _wav_batch(batch)
    assert wb.wav.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(wb.wav), wav.astype(np.float32) / 32768.0
    )


# ------------------------------------------------------- prefetch_to_device


def test_prefetch_order_and_pairing():
    items = [{"i": np.int32(i)} for i in range(7)]
    out = list(prefetch_to_device(iter(items), lambda b: {"i2": b["i"] * 2},
                                  depth=3))
    assert [int(h["i"]) for h, _ in out] == list(range(7))
    assert [int(d["i2"]) for _, d in out] == [2 * i for i in range(7)]


def test_prefetch_depth_zero_serial():
    items = [{"i": i} for i in range(3)]
    out = list(prefetch_to_device(iter(items), lambda b: b, depth=0))
    assert len(out) == 3


def test_prefetch_runs_ahead():
    """With depth=2 the producer stages batches while the consumer sleeps."""
    staged = []

    def gen():
        for i in range(5):
            yield {"i": i}

    it = prefetch_to_device(gen(), lambda b: staged.append(b["i"]) or b,
                            depth=2)
    next(it)
    time.sleep(0.5)
    # first yielded, and up to `depth` more already placed
    assert len(staged) >= 3
    list(it)  # drain
    assert staged == list(range(5))


def test_prefetch_propagates_put_error():
    def bad_put(b):
        if b["i"] == 2:
            raise RuntimeError("device full")
        return b

    it = prefetch_to_device(iter([{"i": i} for i in range(4)]), bad_put,
                            depth=2)
    got = []
    with pytest.raises(RuntimeError, match="device full"):
        for h, _ in it:
            got.append(h["i"])
    assert got == [0, 1]


def test_prefetch_early_break_no_hang():
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"i": i}

    it = prefetch_to_device(gen(), lambda b: b, depth=2)
    for n, _ in enumerate(it):
        if n == 3:
            break
    it.close()
    time.sleep(0.5)
    n_after = len(produced)
    time.sleep(0.3)
    assert len(produced) == n_after  # producer actually stopped


def test_prefetch_with_mesh_placement(corpus):
    """End-to-end with the real device placement on the 8-device mesh."""
    from psla_tpu.parallel.distributed import make_global_batch
    from psla_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # 8-device 'data' mesh: batch must divide by 8
    loader = _loader(corpus, "int16", mixup=False, batch_size=8)
    loader.set_epoch(1)
    pairs = list(prefetch_to_device(
        iter(loader), lambda b: make_global_batch(b, mesh), depth=2
    ))
    assert len(pairs) == loader.batches_per_epoch()
    host, dev = pairs[0]
    assert "n_valid" in host and "n_valid" not in dev
    assert dev["wav"].dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(dev["wav"]), host["wav"])
