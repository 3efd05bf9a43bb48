"""Experiment monitor (tools/watch.py) over a synthetic exp_dir."""

import json
import os

import numpy as np

from psla_tpu.tools.watch import main, read_state, render


def _fake_exp(d, epochs_done=2, n_epochs=3, ensemble=1):
    os.makedirs(d, exist_ok=True)
    cfg = dict(dataset="audioset", model="efficientnet", eff_b=2,
               n_class=527, batch_size=100, lr=1e-4, n_epochs=n_epochs,
               ensemble_seeds=ensemble)
    json.dump(cfg, open(os.path.join(d, "config.json"), "w"))
    rows = np.zeros((n_epochs, 10))
    for i in range(epochs_done):
        rows[i] = [0.3 + 0.05 * i, 0.9, 0.2, 0.3, 1.8, 0.02, 0.03,
                   0.32 + 0.05 * i, 0.91, 1e-4]
    np.savetxt(os.path.join(d, "result.csv"), rows, delimiter=",")
    json.dump(
        {"epoch": epochs_done, "global_step": 100 * epochs_done,
         "best_epoch": epochs_done, "best_metric": 0.3 + 0.05 * (epochs_done - 1)},
        open(os.path.join(d, "progress.json"), "w"),
    )


def test_snapshot(tmp_path, capsys):
    d = str(tmp_path / "exp")
    _fake_exp(d)
    assert main([d, "--once"]) == 0
    out = capsys.readouterr().out
    assert "efficientnet-b2" in out
    assert "epoch   1" in out and "epoch   2" in out
    assert "best: metric 0.3500 @ epoch 2" in out


def test_incremental_rendering(tmp_path):
    d = str(tmp_path / "exp")
    _fake_exp(d, epochs_done=1)
    state = read_state(d)
    text, seen = render(state, 0)
    assert seen == 1 and "epoch   1" in text
    _fake_exp(d, epochs_done=3)  # two more epochs land
    text, seen = render(read_state(d), seen)
    assert seen == 3
    assert "epoch   2" in text and "epoch   3" in text
    assert "epoch   1" not in text  # only NEW rows re-rendered


def test_follow_terminates_when_complete(tmp_path, capsys):
    d = str(tmp_path / "exp")
    _fake_exp(d, epochs_done=3, n_epochs=3)
    assert main([d, "--interval", "0.01"]) == 0
    assert "training complete." in capsys.readouterr().out


def test_empty_dir_is_graceful(tmp_path):
    assert main([str(tmp_path), "--once"]) == 0
