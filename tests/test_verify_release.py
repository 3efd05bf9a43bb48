"""psla-verify-release: the hour-one egress drill, fixture-mocked end to end.

Zero egress here, so the chain (download -> convert -> single-wav predict
-> eval mAP vs the published README number -> ONE JSON verdict) is driven
through a file:// URL over a reference-layout .pth fixture and a synthetic
eval set — the exact code path a real Dropbox release takes
(/root/reference/pretrained_models/README.md:5).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from psla_tpu import assets  # noqa: E402
from psla_tpu.data.wav import write_wav  # noqa: E402
from psla_tpu.tools.verify_release import main, verify  # noqa: E402
from tests.test_convert import _effnet_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def release_pth(tmp_path_factory):
    """Reference-layout .pth with the published models' key structure
    (_effnet_state_dict already emits the DataParallel 'module.' prefixes
    the real files have)."""
    rng = np.random.RandomState(0)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in _effnet_state_dict(0, 527, 4, rng).items()}
    p = tmp_path_factory.mktemp("release") / "as_mdl_0.pth"
    torch.save(sd, str(p))
    return str(p)


@pytest.fixture(scope="module")
def eval_set(tmp_path_factory):
    """Tiny eval datafile labeled with real AudioSet mids (bundled vocab)."""
    d = tmp_path_factory.mktemp("evalset")
    import csv

    with open(assets.audioset_label_csv()) as f:
        mids = [row["mid"] for row in csv.DictReader(f)][:2]
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    entries = []
    for i in range(8):
        p = str(d / f"{i}.wav")
        tone = 0.3 * np.sin(2 * np.pi * (300 if i % 2 else 800) * t)
        write_wav(p, tone + rng.standard_normal(16000) * 0.05, 16000)
        entries.append({"wav": p, "labels": mids[i % 2]})
    df = str(d / "eval.json")
    with open(df, "w") as f:
        json.dump({"data": entries}, f)
    return df


def _common_flags(release_pth, out_dir):
    return [
        "as_mdl_0", "--url", f"file://{release_pth}", "--out", out_dir,
        "--eff_b", "0", "--target_length", "64", "--batch-size", "8",
    ]


def test_full_chain_verdict_ok(release_pth, eval_set, tmp_path, capsys):
    rc = main([
        *_common_flags(release_pth, str(tmp_path / "zoo")),
        "--eval-data", eval_set,
        # a random-weights fixture can't hit 0.440; the acceptance band is
        # widened so this case exercises the PASS path
        "--tolerance", "1.0",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    verdict = json.loads(out)  # ONE machine-readable JSON line
    assert rc == 0
    assert verdict["ok"] is True
    assert verdict["stages"]["fetch_convert"]["ok"]
    assert os.path.isdir(verdict["stages"]["fetch_convert"]["ckpt"])
    pred = verdict["stages"]["predict"]
    assert pred["ok"] and 0.0 <= pred["top1_prob"] <= 1.0
    ev = verdict["stages"]["eval"]
    assert ev["ok"] and np.isfinite(ev["mAP"])
    assert ev["expected_mAP"] == 0.440  # pulled from the zoo entry
    assert ev["within_tolerance"] is True


def test_map_outside_tolerance_fails(release_pth, eval_set, tmp_path, capsys):
    rc = main([
        *_common_flags(release_pth, str(tmp_path / "zoo")),
        "--eval-data", eval_set,
        "--expected-map", "0.999", "--tolerance", "1e-6",
    ])
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert verdict["ok"] is False
    assert verdict["stages"]["eval"]["within_tolerance"] is False
    # the earlier stages still verified — only the mAP gate failed
    assert verdict["stages"]["fetch_convert"]["ok"]
    assert verdict["stages"]["predict"]["ok"]


def test_eval_skipped_without_data(release_pth, tmp_path, capsys):
    rc = main(_common_flags(release_pth, str(tmp_path / "zoo")))
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and verdict["ok"] is True
    assert "skipped" in verdict["stages"]["eval"]


def test_fetch_failure_is_a_clean_verdict(tmp_path, capsys):
    verdict = verify(
        "as_mdl_0", str(tmp_path / "zoo"),
        url="file:///nonexistent/nope.pth",
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == verdict
    assert verdict["ok"] is False
    assert not verdict["stages"]["fetch_convert"]["ok"]
    assert "predict" not in verdict["stages"]  # short-circuited
