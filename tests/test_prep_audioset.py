"""AudioSet datafile prep (tools/prep_audioset.py)."""

import json
import os

import numpy as np

from psla_tpu.data.wav import write_wav
from psla_tpu.tools import prep_audioset


SEGMENTS = """# Segments csv created Sun Mar 5 2017
# num_ytids=4, num_segs=4
# YTID, start_seconds, end_seconds, positive_labels
abc123, 30.000, 40.000, "/m/0,/m/1"
def456, 0.000, 10.000, "/m/1"
missing1, 5.000, 15.000, "/m/0"
ghi789, 1.000, 11.000, "/m/zzz"
"""


def test_build_datafile(tmp_path):
    seg = tmp_path / "segments.csv"
    seg.write_text(SEGMENTS)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    write_wav(str(wav_dir / "abc123.wav"), rng.standard_normal(4000) * 0.2, 16000)
    # downloader-prefixed name variant
    write_wav(str(wav_dir / "Ydef456.wav"), rng.standard_normal(4000) * 0.2, 16000)
    write_wav(str(wav_dir / "ghi789.wav"), rng.standard_normal(4000) * 0.2, 16000)
    label_csv = tmp_path / "labels.csv"
    label_csv.write_text("index,mid,display_name\n0,/m/0,a\n1,/m/1,b\n")
    out = tmp_path / "df" / "train.json"

    rc = prep_audioset.main([
        "--segments-csv", str(seg), "--wav-dir", str(wav_dir),
        "--label-csv", str(label_csv), "--out", str(out),
    ])
    assert rc == 0
    data = json.loads(out.read_text())["data"]
    # missing1 has no wav; ghi789 has only an unknown mid -> dropped
    assert len(data) == 2
    assert data[0]["labels"] == "/m/0,/m/1"
    assert data[1]["labels"] == "/m/1"
    assert os.path.exists(str(out)[:-5] + "_weight.csv")
