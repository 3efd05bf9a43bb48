"""End-to-end training engine tests on a synthetic corpus (SURVEY.md §4d).

Covers: artifact layout (result.csv, predictions CSVs, checkpoints,
progress), learning (loss decreases / beats chance mAP on separable tones),
checkpoint-ensemble accumulation, weight averaging, and true resume.
"""

import os

import jax
import numpy as np
import pytest

from psla_tpu.config import ExperimentConfig
from psla_tpu.data import AudioLoader, LoaderConfig, load_datafile
from psla_tpu.frontend.pipeline import PreprocessConfig
from psla_tpu.train import Trainer
from tests.synth import build_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return build_corpus(
        str(root), num_classes=4, clips_per_class=6, seconds=1.0,
        multi_label_frac=0.0,
    )


def _make_trainer(corpus, exp_dir, **overrides) -> Trainer:
    datafile, label_csv = corpus
    cfg = ExperimentConfig(
        impretrain=False,
        data_train=datafile, data_val=datafile, label_csv=label_csv,
        exp_dir=exp_dir, n_class=4, model="efficientnet", eff_b=0, att_head=1,
        target_length=128, freqm=0, timem=0, mixup=0.0,
        lr=5e-3, batch_size=8, n_epochs=3, warmup=False,
        bn_momentum=0.3,  # fast-moving running stats so eval tracks train
        lrscheduler_start=100, wa=True, wa_start=2, wa_end=3,
        num_workers=2, n_print_steps=1000, bal=False, seed=0,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    df = load_datafile(datafile, label_csv)
    pre = cfg.preprocess_config()
    buf = pre.fbank.buffer_length(cfg.target_length)
    train_loader = AudioLoader(
        df,
        LoaderConfig(batch_size=cfg.batch_size, buffer_samples=buf,
                     num_workers=2, mixup=cfg.mixup > 0, seed=cfg.seed),
    )
    val_loader = AudioLoader(
        df,
        LoaderConfig(batch_size=cfg.batch_size, buffer_samples=buf,
                     num_workers=2, drop_remainder=False),
        shuffle=False,
    )
    return Trainer(cfg, train_loader, val_loader)


@pytest.fixture(scope="module")
def trained(corpus, tmp_path_factory):
    exp_dir = str(tmp_path_factory.mktemp("exp"))
    trainer = _make_trainer(corpus, exp_dir)
    state = trainer.train()
    return trainer, state, exp_dir


def test_artifacts_written(trained):
    _, _, exp_dir = trained
    result = np.loadtxt(os.path.join(exp_dir, "result.csv"), delimiter=",")
    assert result.shape == (3, 10)
    assert np.all(result[:, 1] > 0)  # AUC column populated
    assert os.path.exists(os.path.join(exp_dir, "predictions", "target.csv"))
    assert os.path.exists(
        os.path.join(exp_dir, "predictions", "ensemble_predictions.csv")
    )
    # epoch-1/2 prediction CSVs deleted by the running ensemble; epoch 3 kept
    assert not os.path.exists(
        os.path.join(exp_dir, "predictions", "predictions_1.csv")
    )
    assert os.path.exists(
        os.path.join(exp_dir, "predictions", "predictions_3.csv")
    )
    for tag in ("epoch_1", "epoch_2", "epoch_3", "best", "wa"):
        assert os.path.isdir(os.path.join(exp_dir, "models", tag)), tag
    assert os.path.exists(os.path.join(exp_dir, "wa_result.csv"))
    assert os.path.exists(os.path.join(exp_dir, "stats_3.pickle"))
    assert os.path.exists(os.path.join(exp_dir, "progress.json"))
    assert os.path.exists(os.path.join(exp_dir, "config.json"))


def test_training_learns(trained):
    _, _, exp_dir = trained
    result = np.loadtxt(os.path.join(exp_dir, "result.csv"), delimiter=",")
    train_losses = result[:, 5]
    assert train_losses[-1] < train_losses[0]
    # 4 separable tone classes: after 3 epochs mAP must beat chance (~0.31)
    assert result[-1, 0] > 0.35, result[:, 0]


def test_resume_continues(trained, corpus):
    trainer, state, exp_dir = trained
    t2 = _make_trainer(corpus, exp_dir, n_epochs=4, wa=False)
    state2 = t2.train(resume=True)
    assert int(state2.step) == int(state.step) + t2.steps_per_epoch
    result = np.loadtxt(os.path.join(exp_dir, "result.csv"), delimiter=",")
    assert result.shape == (4, 10)
    assert result[3, 1] > 0  # epoch 4 row filled


def test_wa_checkpoint_loadable(trained):
    trainer, _, _ = trained
    wa_state = trainer.restore_checkpoint("wa")
    stats, loss = trainer.validate(wa_state, trainer.val_loader, "wa_check")
    assert np.isfinite(loss)
    assert len(stats) == 4


def test_profile_trace_written(corpus, tmp_path_factory):
    """config.profile_steps captures a jax.profiler trace window into
    {exp_dir}/profile (SURVEY §5.1 observability beyond the reference's
    wall-clock meters)."""
    exp_dir = str(tmp_path_factory.mktemp("exp_prof"))
    trainer = _make_trainer(
        corpus, exp_dir, n_epochs=1, wa=False,
        profile_steps=1, profile_start_step=1,
    )
    trainer.train()
    prof_dir = os.path.join(exp_dir, "profile")
    assert os.path.isdir(prof_dir)
    traces = [
        os.path.join(root, f)
        for root, _, files in os.walk(prof_dir)
        for f in files
    ]
    assert traces, "no trace files written"


def test_tensorboard_scalars_written(corpus, tmp_path_factory):
    """config.tensorboard mirrors the result.csv metrics as TB scalars
    in {exp_dir}/tb (observability beyond the reference's print+CSV)."""
    pytest.importorskip("torch.utils.tensorboard")
    exp_dir = str(tmp_path_factory.mktemp("exp_tb"))
    trainer = _make_trainer(
        corpus, exp_dir, n_epochs=1, wa=False, tensorboard=True,
    )
    trainer.train()
    tb_dir = os.path.join(exp_dir, "tb")
    assert os.path.isdir(tb_dir)
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, os.listdir(tb_dir)


def test_resume_reproduces_uninterrupted_run(corpus, tmp_path_factory):
    """A 1-epoch run resumed for a 2nd epoch must equal a fresh 2-epoch
    run exactly: per-step RNG keys derive from (seed, restored step) and
    sampling/mixup draws are epoch-keyed, so the trajectories coincide."""
    exp_a = str(tmp_path_factory.mktemp("exp_norestart"))
    state_a = _make_trainer(corpus, exp_a, n_epochs=2, wa=False).train()

    exp_b = str(tmp_path_factory.mktemp("exp_restart"))
    _make_trainer(corpus, exp_b, n_epochs=1, wa=False).train()
    state_b = _make_trainer(corpus, exp_b, n_epochs=2, wa=False).train(
        resume=True
    )

    assert int(state_a.step) == int(state_b.step)
    leaves_a = jax.tree.leaves(state_a.params)
    leaves_b = jax.tree.leaves(state_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        )


def _poison_step(trainer, nan_at_call):
    """Wrap trainer.train_step to NaN the loss METRIC of one step only.

    Subsequent losses stay finite, so the abort can only come from the
    device-side OR-accumulated divergence flag — the reference's
    loss_meter.avg window semantics (traintest.py:125-131), not from NaN
    stickiness through the params."""
    import jax.numpy as jnp

    orig = trainer.train_step
    calls = {"n": 0}

    def poisoned(state, batch, rng):
        state, metrics = orig(state, batch, rng)
        calls["n"] += 1
        if calls["n"] == nan_at_call:
            metrics = dict(metrics, loss=metrics["loss"] * jnp.nan)
        return state, metrics

    trainer.train_step = poisoned


def test_nan_abort_within_print_window(corpus, tmp_path_factory, capsys):
    """NaN at step 1 (not a print step) aborts at the NEXT print step
    (gstep 2) with the exact reference message, even though step 2's own
    loss is finite (traintest.py:129-131)."""
    exp_dir = str(tmp_path_factory.mktemp("exp_nan_window"))
    trainer = _make_trainer(corpus, exp_dir, n_print_steps=2)
    _poison_step(trainer, nan_at_call=1)
    state = trainer.train()
    out = capsys.readouterr().out
    assert "training diverged..." in out
    # aborted at the print step that saw the flag: 2 steps ran, not the
    # full 3-step epoch, and validation/artifacts never happened
    assert int(state.step) == 2
    assert not os.path.exists(os.path.join(exp_dir, "stats_1.pickle"))


def test_nan_abort_epoch_end_backstop(corpus, tmp_path_factory, capsys):
    """NaN on the epoch's LAST step with print steps that never fire:
    the epoch-end loss fetch must still abort before validate/ckpt."""
    exp_dir = str(tmp_path_factory.mktemp("exp_nan_backstop"))
    trainer = _make_trainer(corpus, exp_dir, n_print_steps=1000)
    _poison_step(trainer, nan_at_call=3)  # 24 clips / bs 8 = 3 steps/epoch
    state = trainer.train()
    out = capsys.readouterr().out
    assert "training diverged..." in out
    assert int(state.step) == 3  # full epoch ran, abort before validate
    assert not os.path.exists(os.path.join(exp_dir, "stats_1.pickle"))


def test_validate_ensemble_replay_is_idempotent(tmp_path):
    """A crash between an epoch's ensemble fold and its progress.json
    write makes the resumed run REPLAY that epoch's validate_ensemble;
    the fold marker inside the CSV must keep the replay from re-adding
    the epoch's predictions at the wrong weight (which would silently
    corrupt every later ensemble metric)."""
    from types import SimpleNamespace

    from psla_tpu.train.loop import Trainer

    pred_dir = tmp_path / "predictions"
    pred_dir.mkdir()
    target = np.tile([[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]], (4, 1))
    np.savetxt(pred_dir / "target.csv", target, delimiter=",")
    stub = SimpleNamespace(
        exp_dir=str(tmp_path),
        _ensemble_folded_epoch=Trainer._ensemble_folded_epoch,
    )
    rng = np.random.RandomState(0)
    p1, p2 = rng.rand(8, 3), rng.rand(8, 3)
    np.savetxt(pred_dir / "predictions_1.csv", p1, delimiter=",")
    Trainer.validate_ensemble(stub, 1)
    np.savetxt(pred_dir / "predictions_2.csv", p2, delimiter=",")
    Trainer.validate_ensemble(stub, 2)
    ens_path = pred_dir / "ensemble_predictions.csv"
    want = np.loadtxt(ens_path, delimiter=",")
    np.testing.assert_allclose(want, (p1 + p2) / 2, rtol=1e-6)

    # replayed epoch 2 (the resumed run re-writes predictions_2.csv
    # identically, then calls validate_ensemble(2) again)
    stats = Trainer.validate_ensemble(stub, 2)
    got = np.loadtxt(ens_path, delimiter=",")
    np.testing.assert_array_equal(got, want)  # NOT re-folded
    assert np.isfinite(np.mean([s["AP"] for s in stats]))

    # epoch 3 after the replay folds normally
    p3 = rng.rand(8, 3)
    np.savetxt(pred_dir / "predictions_3.csv", p3, delimiter=",")
    Trainer.validate_ensemble(stub, 3)
    got3 = np.loadtxt(ens_path, delimiter=",")
    np.testing.assert_allclose(got3, (p1 + p2 + p3) / 3, rtol=1e-6)
