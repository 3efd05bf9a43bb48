"""CLI end-to-end test: the full reference protocol on a synthetic corpus —
train + validate + weight averaging + post-training summary with a separate
eval set (the FSD50K-style branch of src/run.py:135-200)."""

import os

import numpy as np
import pytest

from psla_tpu import cli
from tests.synth import build_corpus


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("clicorpus")
    datafile, label_csv = build_corpus(
        str(root), num_classes=3, clips_per_class=4, seconds=0.5,
        multi_label_frac=0.0,
    )
    exp_dir = str(tmp_path_factory.mktemp("cliexp"))
    summary = cli.run([
        "--data-train", datafile,
        "--data-val", datafile,
        "--data-eval", datafile,
        "--label-csv", label_csv,
        "--exp-dir", exp_dir,
        "--n_class", "3",
        "--eff_b", "0",
        "--impretrain", "False",
        "--att_head", "4",
        "--target_length", "64",
        "--freqm", "0", "--timem", "0", "--mixup", "0.0",
        "--lr", "2e-3",
        "--batch-size", "8",
        "--n-epochs", "2",
        "--warmup", "False",
        "--wa", "True", "--wa_start", "1", "--wa_end", "2",
        "--bal", "True",
        "--num-workers", "2",
    ])
    return summary, exp_dir


def test_summary_structure(cli_run):
    summary, _ = cli_run
    assert set(summary) == {"best_single", "wa", "ensemble"}
    for part in summary.values():
        assert np.isfinite(part["eval_mAP"])
        assert 0 <= part["eval_mAP"] <= 1


def test_protocol_artifacts(cli_run):
    _, exp_dir = cli_run
    for f in (
        "result.csv", "best_single_result.csv", "wa_result.csv",
        "ensemble_result.csv", "config.json", "progress.json",
    ):
        assert os.path.exists(os.path.join(exp_dir, f)), f
    # eval-branch artifacts (run.py:135-200 behavior)
    assert os.path.exists(
        os.path.join(exp_dir, "predictions", "eval_target.csv")
    )
    assert os.path.exists(
        os.path.join(exp_dir, "predictions", "predictions_eval_2.csv")
    )
    # 4-value result files: [val_mAP, val_mAUC, eval_mAP, eval_mAUC]
    bs = np.loadtxt(os.path.join(exp_dir, "best_single_result.csv"))
    assert bs.shape == (4,)


def test_preset_and_override():
    args = cli.build_parser().parse_args(
        ["--preset", "fsd50k", "--lr", "1e-3", "--data-train", "x.json"]
    )
    cfg = cli.config_from_args(args)
    assert cfg.n_class == 200  # from preset
    assert cfg.target_length == 3000
    assert cfg.lr == 1e-3  # explicit flag wins
    assert cfg.batch_size == 24


def test_compilation_cache_flag(tmp_path):
    """--compilation-cache maps to the config and the Trainer wires it
    into jax (persistent XLA cache for restart/relaunch compile skips)."""
    import jax

    cache = str(tmp_path / "xla_cache")
    args = cli.build_parser().parse_args(["--compilation-cache", cache])
    cfg = cli.config_from_args(args)
    assert cfg.compilation_cache == cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        from psla_tpu.config import ExperimentConfig
        from psla_tpu.train.loop import Trainer

        tiny = ExperimentConfig(
            exp_dir=str(tmp_path / "exp"), n_class=3, eff_b=0, att_head=1,
            impretrain=False, target_length=64, batch_size=8,
            compilation_cache=cache,
        )

        class _Loader:  # Trainer init only asks for batches_per_epoch
            def batches_per_epoch(self):
                return 1

        Trainer(tiny, _Loader(), _Loader())
        assert jax.config.jax_compilation_cache_dir == os.path.abspath(cache)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_console_entry_exit_code(monkeypatch):
    """pyproject wires psla-train to sys.exit(cli.main(...)): main must
    return 0 on success, NOT the summary dict (sys.exit(dict) = status 1)."""
    monkeypatch.setattr(cli, "run", lambda argv=None: {"not": "an exit code"})
    assert cli.main([]) == 0
