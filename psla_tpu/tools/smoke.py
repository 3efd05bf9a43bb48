"""End-to-end smoke test on the current backend (TPU or CPU).

Deployment sanity-check: generates a tiny synthetic two-class dataset
(class-dependent tones), runs the FULL pipeline — host decode -> on-device
preprocessing (mixup/fbank/SpecAugment) -> training epochs -> validation ->
checkpoint ensemble -> weight averaging -> post-training protocol — and
asserts every expected artifact lands in the experiment directory.

    python -m psla_tpu.tools.smoke [--epochs 2] [--keep]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import tempfile

import numpy as np


def run(epochs: int = 2, exp_root: str | None = None) -> dict:
    from psla_tpu.cli import run as cli_run
    from psla_tpu.data.wav import write_wav

    d = exp_root or tempfile.mkdtemp(prefix="psla_smoke_")
    rng = np.random.default_rng(0)
    entries = []
    t = np.arange(16000) / 16000
    for i in range(16):
        p = os.path.join(d, f"{i}.wav")
        tone = 0.3 * np.sin(2 * np.pi * (300 if i % 2 else 800) * t)
        write_wav(p, tone + rng.standard_normal(16000) * 0.05, 16000)
        entries.append({"wav": p, "labels": "/m/0" if i % 2 else "/m/1"})
    for name in ("tr", "val"):
        with open(os.path.join(d, f"{name}.json"), "w") as f:
            json.dump({"data": entries}, f)
    with open(os.path.join(d, "labels.csv"), "w") as f:
        f.write("index,mid,display_name\n0,/m/0,tone300\n1,/m/1,tone800\n")

    exp = os.path.join(d, "exp")
    summary = cli_run([
        "--data-train", os.path.join(d, "tr.json"),
        "--data-val", os.path.join(d, "val.json"),
        "--label-csv", os.path.join(d, "labels.csv"),
        "--exp-dir", exp,
        "--n_class", "2", "--eff_b", "0", "--target_length", "64",
        "--impretrain", "False",
        "--batch-size", "8", "--n-epochs", str(epochs),
        "--wa", "True", "--wa_start", "1", "--wa_end", str(epochs),
        "--bal", "True", "--dtype", "bfloat16",
        "--n-print-steps", "100", "--lr", "1e-3",
    ])
    expect = {
        "result.csv", "config.json", "progress.json", "wa_result.csv",
        "best_single_result.csv", "ensemble_result.csv", "models",
        "predictions",
    }
    have = {os.path.basename(p) for p in glob.glob(os.path.join(exp, "*"))}
    missing = expect - have
    assert not missing, f"missing artifacts: {missing}"
    for key in ("best_single", "wa", "ensemble"):
        assert np.isfinite(summary[key]["eval_mAP"]), summary
    return {"summary": summary, "exp_dir": d}


def main_cli(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--keep", action="store_true",
                   help="keep the experiment directory")
    args = p.parse_args(argv)
    res = run(args.epochs)
    import jax

    print(f"SMOKE OK on backend={jax.default_backend()}: {res['summary']}")
    if not args.keep:
        shutil.rmtree(res["exp_dir"], ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main_cli())
