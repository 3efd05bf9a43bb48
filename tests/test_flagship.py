"""psla-flagship --synthetic-learnable: corpus + machinery tests.

The learnable corpus is the no-egress accuracy-evidence layer (the r3
flagship rehearsal used random labels, so it could only prove
shape/throughput): class identity must be recoverable from the audio, or
the on-chip mAP~=1.0 assertion would be testing noise.
"""

import json
import os

import numpy as np
import pytest

from psla_tpu.tools.flagship import make_learnable_corpus


def test_learnable_corpus_structure(tmp_path):
    files = make_learnable_corpus(
        str(tmp_path), n_train=12, n_val=8, n_class=4, target_length=64
    )
    labels = open(files["label_csv"]).read().splitlines()
    assert labels[0] == "index,mid,display_name"
    assert len(labels) == 5
    train = json.load(open(files["train"]))["data"]
    val = json.load(open(files["val"]))["data"]
    assert len(train) == 12 and len(val) == 8
    # balanced single-label assignment, files on disk
    counts = {}
    for e in train:
        counts[e["labels"]] = counts.get(e["labels"], 0) + 1
        assert os.path.exists(e["wav"])
        assert "," not in e["labels"]
    assert set(counts.values()) == {3}


def test_learnable_corpus_classes_separable(tmp_path):
    """Class identity must be recoverable from the WAVs by a trivial
    spectral-peak classifier — if plain FFT peak-matching can't separate
    the classes, the flagship model assertion upstream is meaningless."""
    from psla_tpu.data.wav import read_wav

    n_class, per = 6, 4
    files = make_learnable_corpus(
        str(tmp_path), n_train=n_class * per, n_val=0, n_class=n_class,
        target_length=64,
    )
    carriers = np.geomspace(125.0, 4000.0, n_class)
    correct = 0
    entries = json.load(open(files["train"]))["data"]
    for e in entries:
        wav, sr = read_wav(e["wav"])
        spec = np.abs(np.fft.rfft(wav))
        f_peak = np.argmax(spec) * sr / len(wav)
        pred = int(np.argmin(np.abs(np.log(carriers) - np.log(max(f_peak, 1)))))
        want = int(e["labels"].rsplit("/", 1)[1])
        correct += pred == want
    assert correct == len(entries), (correct, len(entries))


@pytest.mark.slow
def test_learnable_preflight_end_to_end(tmp_path):
    """The full --synthetic-learnable machinery (corpus -> CLI subprocess
    -> result.csv/wa/ensemble parsing) at toy shape on CPU. Accuracy
    asserts are skipped in preflight (12 toy steps can't learn); the
    on-chip flagship-shape run is the accuracy evidence (PERF.md)."""
    from psla_tpu.tools.flagship import run_learnable

    res = run_learnable(
        clips=32, val_clips=16, n_class=4, epochs=2, batch_size=16,
        lr=1e-3, out=str(tmp_path), preflight=True, n_print_steps=1,
    )
    assert res["mode"] == "synthetic-learnable"
    assert len(res["per_epoch_mAP"]) == 2
    assert res["ensemble_mAP"] is not None
    assert res["wa_mAP"] is not None
    assert os.path.exists(os.path.join(str(tmp_path), "exp", "result.csv"))
