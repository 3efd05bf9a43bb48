"""Ensemble-axis training through the Trainer/CLI (round-1 verdict #4).

Trains 2 seeds in one program on the 8-device CPU mesh (2x4
ensemble x data) end-to-end: per-seed learning, per-seed artifacts,
seed-mean ensemble quality, per-seed checkpoint extraction, and the
post-training protocol.
"""

import glob
import os

import numpy as np
import pytest

from psla_tpu import cli
from tests.synth import build_corpus


@pytest.fixture(scope="module")
def ens_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("enscorpus")
    datafile, label_csv = build_corpus(
        str(root), num_classes=3, clips_per_class=4, seconds=0.5,
        multi_label_frac=0.0,
    )
    exp_dir = str(tmp_path_factory.mktemp("ensexp"))
    summary = cli.run([
        "--data-train", datafile,
        "--data-val", datafile,
        "--data-eval", datafile,
        "--label-csv", label_csv,
        "--exp-dir", exp_dir,
        "--n_class", "3", "--eff_b", "0", "--att_head", "1",
        "--impretrain", "False",
        "--target_length", "64",
        "--freqm", "0", "--timem", "0", "--mixup", "0.0",
        "--lr", "2e-3", "--batch-size", "8", "--n-epochs", "2",
        "--warmup", "False",
        "--wa", "True", "--wa_start", "1", "--wa_end", "2",
        "--bal", "False", "--num-workers", "2",
        "--ensemble-seeds", "2",
    ])
    return summary, exp_dir


def test_summary_and_protocol(ens_run):
    summary, exp_dir = ens_run
    assert set(summary) == {"best_single", "wa", "ensemble"}
    for part in summary.values():
        assert np.isfinite(part["eval_mAP"])
    # the standard protocol artifacts exist (same layout as single-model)
    for f in ("result.csv", "best_single_result.csv", "wa_result.csv",
              "ensemble_result.csv", "seed_result.csv"):
        assert os.path.exists(os.path.join(exp_dir, f)), f


def test_per_seed_artifacts(ens_run):
    _, exp_dir = ens_run
    # per-seed prediction matrices for the last epoch + each protocol tag
    pred_dir = os.path.join(exp_dir, "predictions")
    assert os.path.exists(os.path.join(pred_dir, "predictions_2_seed0.csv"))
    assert os.path.exists(os.path.join(pred_dir, "predictions_2_seed1.csv"))
    # older per-seed epochs cleaned up (disk bounding)
    assert not os.path.exists(os.path.join(pred_dir, "predictions_1_seed0.csv"))
    # per-seed extracted checkpoints for best + wa (single-model format)
    for tag in ("best", "wa"):
        for i in (0, 1):
            assert os.path.isdir(
                os.path.join(exp_dir, "models", f"{tag}_seed{i}")
            ), (tag, i)


def test_seeds_differ_and_learn(ens_run):
    _, exp_dir = ens_run
    p0 = np.loadtxt(
        os.path.join(exp_dir, "predictions", "predictions_2_seed0.csv"),
        delimiter=",",
    )
    p1 = np.loadtxt(
        os.path.join(exp_dir, "predictions", "predictions_2_seed1.csv"),
        delimiter=",",
    )
    # genuinely different models
    assert np.abs(p0 - p1).max() > 1e-4
    # seed-mean CSV is the arithmetic mean of the members
    pm = np.loadtxt(
        os.path.join(exp_dir, "predictions", "predictions_2.csv"),
        delimiter=",",
    )
    np.testing.assert_allclose(pm, (p0 + p1) / 2, atol=1e-5)


def test_ensemble_at_least_as_good_as_members(ens_run):
    _, exp_dir = ens_run
    rows = np.loadtxt(
        os.path.join(exp_dir, "seed_result.csv"), delimiter=",", dtype=str
    )
    rows = np.atleast_2d(rows)
    # epoch-2 row: [tag, mAP_seed0, mAP_seed1, ensemble_mAP]
    epoch2 = [r for r in rows if r[0] == "2"][0]
    m0, m1, ens = float(epoch2[1]), float(epoch2[2]), float(epoch2[3])
    assert ens >= min(m0, m1) - 1e-6
    assert ens >= (m0 + m1) / 2 - 0.02  # mean-prediction ensembles ~never
    #                                     fall below the member mean


def test_ensemble_resume_extends_training(ens_run):
    """--resume restores the stacked epoch checkpoint and trains on:
    the extend-training workflow (n_epochs raised from 2 to 3)."""
    _, exp_dir = ens_run
    # recover the corpus paths from the saved config
    import json

    with open(os.path.join(exp_dir, "config.json")) as f:
        cfg = json.load(f)
    summary = cli.run([
        "--data-train", cfg["data_train"],
        "--data-val", cfg["data_val"],
        "--label-csv", cfg["label_csv"],
        "--exp-dir", exp_dir,
        "--n_class", "3", "--eff_b", "0", "--att_head", "1",
        "--impretrain", "False",
        "--target_length", "64",
        "--freqm", "0", "--timem", "0", "--mixup", "0.0",
        "--lr", "2e-3", "--batch-size", "8", "--n-epochs", "3",
        "--warmup", "False", "--wa", "False",
        "--bal", "False", "--num-workers", "2",
        "--ensemble-seeds", "2", "--resume",
    ])
    assert np.isfinite(summary["best_single"]["eval_mAP"])
    rows = np.atleast_2d(np.loadtxt(
        os.path.join(exp_dir, "result.csv"), delimiter=","
    ))
    assert rows.shape[0] == 3 and np.any(rows[2] != 0)  # epoch 3 trained
    assert os.path.isdir(os.path.join(exp_dir, "models", "epoch_3"))
    # stacked step advanced beyond the first run's
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(
        os.path.join(exp_dir, "models", "epoch_3")
    )
    assert np.all(np.asarray(tree["step"]) == 3)  # 1 step/epoch x 3 epochs


def test_seeds_need_not_divide_devices(ens_run, tmp_path):
    """--ensemble-seeds works on ANY device count: 2 seeds on a 1-device
    mesh train as 2 unrolled local members of a (1, 1) ensemble mesh
    (the single-chip layout; same mechanism carries 10 seeds on 8 chips).
    Reuses the module corpus; 1 epoch."""
    summary, exp_dir0 = ens_run
    import json

    with open(os.path.join(exp_dir0, "config.json")) as f:
        cfg = json.load(f)
    exp_dir = str(tmp_path / "ens1dev")
    summary = cli.run([
        "--data-train", cfg["data_train"],
        "--data-val", cfg["data_val"],
        "--label-csv", cfg["label_csv"],
        "--exp-dir", exp_dir,
        "--n_class", "3", "--eff_b", "0", "--att_head", "1",
        "--impretrain", "False",
        "--target_length", "64",
        "--freqm", "0", "--timem", "0", "--mixup", "0.0",
        "--lr", "2e-3", "--batch-size", "4", "--n-epochs", "1",
        "--warmup", "False", "--wa", "False",
        "--bal", "False", "--num-workers", "2",
        "--ensemble-seeds", "2", "--num-devices", "1",
    ])
    assert np.isfinite(summary["best_single"]["eval_mAP"])
    rows = np.atleast_2d(np.loadtxt(
        os.path.join(exp_dir, "seed_result.csv"), delimiter=",", dtype=str
    ))
    epoch1 = [r for r in rows if r[0] == "1"][0]
    assert len(epoch1) == 4  # key, 2 member mAPs, ensemble mAP
    # genuinely distinct members even with both seeds local to one device
    p0 = np.loadtxt(
        os.path.join(exp_dir, "predictions", "predictions_1_seed0.csv"),
        delimiter=",",
    )
    p1 = np.loadtxt(
        os.path.join(exp_dir, "predictions", "predictions_1_seed1.csv"),
        delimiter=",",
    )
    assert np.abs(p0 - p1).max() > 1e-4


def test_per_seed_checkpoints_load_as_single_models(ens_run):
    """best_seed{i} checkpoints are plain single-model orbax trees."""
    import orbax.checkpoint as ocp

    _, exp_dir = ens_run
    ckpt = ocp.PyTreeCheckpointer()
    t0 = ckpt.restore(os.path.join(exp_dir, "models", "best_seed0"))
    t1 = ckpt.restore(os.path.join(exp_dir, "models", "best_seed1"))
    assert "params" in t0 and "batch_stats" in t0
    # no leading ensemble axis: stem conv kernel is rank-4 HWIO
    k0 = t0["params"]["effnet"]["stem"]["conv"]["kernel"]
    assert np.ndim(k0) == 4
    k1 = t1["params"]["effnet"]["stem"]["conv"]["kernel"]
    assert np.abs(np.asarray(k0) - np.asarray(k1)).max() > 1e-6  # distinct seeds


def test_loader_shard_guard_multihost():
    """EnsembleTrainer rejects loaders sharded by GLOBAL host id when the
    ensemble axis replicates data across rows: hosts at the same position
    within their row must feed identical rows (ADVICE r2: hand-built
    loaders on a pod previously fed divergent data silently)."""
    from types import SimpleNamespace

    from psla_tpu.train.ensemble_loop import EnsembleTrainer

    def stub(host_id, num_hosts):
        loader = SimpleNamespace(
            config=SimpleNamespace(host_id=host_id, num_hosts=num_hosts)
        )
        return SimpleNamespace(
            train_loader=loader, val_loader=loader, eval_loader=None
        )

    # matching within-row shard: OK
    EnsembleTrainer._check_loader_shards(stub(0, 1), 0, 1)
    EnsembleTrainer._check_loader_shards(stub(1, 2), 1, 2)
    # global-host-id sharding where the row expects position 0/1: rejected
    with pytest.raises(ValueError, match="ensemble row"):
        EnsembleTrainer._check_loader_shards(stub(1, 2), 0, 1)
    # duck typing: loaders without a LoaderConfig-style .config are skipped
    bare = SimpleNamespace(
        train_loader=object(), val_loader=object(), eval_loader=None
    )
    EnsembleTrainer._check_loader_shards(bare, 0, 1)
