"""PROTOCOL-level torch-twin parity (VERDICT r3 #3): both frameworks run
their FULL training protocols — scheduled Adam (staircase warmup +
MultiStep decay), mixup + SpecAugment, per-epoch validation, running
checkpoint-ensemble, 1/N weight averaging — from identical weights on an
identical synthetic corpus, and the per-epoch result trajectories
(mAP/AUC/train/valid loss) and final wa/ensemble numbers must agree.

This upgrades the step/trajectory parity of test_torch_twin.py to "the
whole training protocol matches" — the strongest accuracy-parity claim
reachable without real AudioSet/FSD50K data (reference:
src/traintest.py:20-230 + run.py:131-233).

Input parity is by construction: the jax run goes through the REAL
Trainer (loader -> jitted steps -> validate -> ensemble -> wa), then the
twin replays the Trainer's exact inputs — the same loader batches
(epoch-keyed sampling is deterministic, proven by the bit-exact resume
test) and the same stochastic preprocessing, re-derived host-side from
the step's published key derivation (fold_in(fold_in(seed_key, 1), step),
train/step.py:135-136). The lr schedule function is shared (itself
torch-oracle-tested in test_optim.py), so any disagreement isolates to
the training ENGINES, not the data or schedule.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

# one module-scoped fixture trains BOTH frameworks through their full
# protocols (~minutes on CPU): every test here is end-to-end slow
pytestmark = pytest.mark.slow

from psla_tpu.config import ExperimentConfig  # noqa: E402
from psla_tpu.data import AudioLoader, LoaderConfig, load_datafile  # noqa: E402
from psla_tpu.metrics import calculate_stats  # noqa: E402
from psla_tpu.models import EffNetAttention  # noqa: E402
from psla_tpu.models.convert import convert_checkpoint  # noqa: E402
from psla_tpu.frontend.pipeline import preprocess_eval, preprocess_train  # noqa: E402
from psla_tpu.train import Trainer  # noqa: E402
from psla_tpu.train.step import _wav_batch  # noqa: E402
from tests.synth import build_corpus  # noqa: E402
from tests.torch_twin import TwinEffNetAttention, twin_protocol_run  # noqa: E402

N_CLASS = 4
N_EPOCHS = 3
BATCH = 8
T_LEN = 64
BN_MOMENTUM = 0.5  # flax convention; torch twin gets 1 - 0.5 = 0.5


def _np_tree(tree):
    return jax.tree.map(np.asarray, tree)


@pytest.fixture(scope="module")
def protocol_runs(tmp_path_factory):
    root = tmp_path_factory.mktemp("twin_corpus")
    datafile, label_csv = build_corpus(
        str(root), num_classes=N_CLASS, clips_per_class=6, seconds=1.0,
        multi_label_frac=0.0,
    )

    # identical starting weights via the production converter + the
    # product --pretrained-ckpt path
    torch.manual_seed(3)
    twin = TwinEffNetAttention(
        N_CLASS, b=0, head_num=4, bn_momentum=1.0 - BN_MOMENTUM
    )
    variables = convert_checkpoint(twin.state_dict(), "efficientnet", N_CLASS)
    import orbax.checkpoint as ocp

    ckpt0 = str(tmp_path_factory.mktemp("init") / "twin_init.ckpt")
    ocp.PyTreeCheckpointer().save(ckpt0, _np_tree(variables), force=True)

    exp_dir = str(tmp_path_factory.mktemp("exp_twin_protocol"))
    cfg = ExperimentConfig(
        impretrain=False, pretrained_ckpt=ckpt0,
        data_train=datafile, data_val=datafile, label_csv=label_csv,
        exp_dir=exp_dir, n_class=N_CLASS, model="efficientnet", eff_b=0,
        att_head=4, target_length=T_LEN,
        # the reference's actual training regime, scaled to T=64
        freqm=8, timem=8, mixup=0.5,
        lr=5e-3, batch_size=BATCH, n_epochs=N_EPOCHS,
        # warmup + decay both fire INSIDE this mini run: 9 total steps,
        # staircase every 2 steps to full lr at step 6; decay milestone
        # from epoch 2
        warmup=True, warmup_steps=6, warmup_update_every=2,
        lrscheduler_start=2, lrscheduler_decay=0.5,
        wa=True, wa_start=2, wa_end=N_EPOCHS,
        bn_momentum=BN_MOMENTUM, bal=False, seed=0,
        num_workers=2, n_print_steps=1000,
    )
    df = load_datafile(datafile, label_csv)
    pre = cfg.preprocess_config()
    buf = pre.fbank.buffer_length(T_LEN)
    train_loader = AudioLoader(
        df, LoaderConfig(batch_size=BATCH, buffer_samples=buf,
                         num_workers=2, mixup=True, seed=cfg.seed),
    )
    val_loader = AudioLoader(
        df, LoaderConfig(batch_size=BATCH, buffer_samples=buf,
                         num_workers=2, drop_remainder=False),
        shuffle=False,
    )
    trainer = Trainer(cfg, train_loader, val_loader)
    # drop-connect off on both sides (the twin has no stochastic depth);
    # everything else identical to the production model
    trainer.model = EffNetAttention(
        label_dim=N_CLASS, b=0, head_num=4, bn_momentum=BN_MOMENTUM,
        drop_connect_rate=0.0,
    )
    trainer._build_steps()
    trainer.train()

    jax_rows = np.loadtxt(os.path.join(exp_dir, "result.csv"), delimiter=",")
    jax_wa = np.loadtxt(os.path.join(exp_dir, "wa_result.csv"))

    # ---- twin replay of the Trainer's exact inputs
    rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 1)
    epochs_train, gstep = [], 0
    for epoch in range(1, N_EPOCHS + 1):
        train_loader.set_epoch(epoch)
        ep = []
        for host_batch in train_loader:
            pre_key, _ = jax.random.split(jax.random.fold_in(rng, gstep))
            fb, lab = preprocess_train(pre_key, _wav_batch(host_batch), pre)
            ep.append((np.asarray(fb), np.asarray(lab)))
            gstep += 1
        epochs_train.append(ep)
    assert gstep == N_EPOCHS * trainer.steps_per_epoch
    # the replay must be genuinely stochastic (mixup soft labels)
    assert any(
        ((0.0 < lab) & (lab < 1.0)).any()
        for ep in epochs_train for _, lab in ep
    )

    eval_pre = pre.eval_variant()
    val_batches = []
    for host_batch in val_loader:
        fb = preprocess_eval(_wav_batch(host_batch), eval_pre)
        val_batches.append(
            (np.asarray(fb), np.asarray(host_batch["labels"]),
             int(host_batch["n_valid"]))
        )

    twin_rows, twin_wa = twin_protocol_run(
        twin, epochs_train, val_batches,
        lr_of_step=lambda s: float(trainer.schedule(s)),
        wa_start=cfg.wa_start, wa_end=cfg.wa_end,
        calculate_stats=calculate_stats,
    )
    # diagnostic dump (visible with -s / on failure)
    for e in range(N_EPOCHS):
        j, t = jax_rows[e], twin_rows[e]
        print(
            f"epoch {e + 1}: jax mAP={j[0]:.4f} auc={j[1]:.4f} "
            f"tl={j[5]:.4f} vl={j[6]:.4f} ens={j[7]:.4f}/{j[8]:.4f} | "
            f"twin mAP={t['mAP']:.4f} auc={t['mAUC']:.4f} "
            f"tl={t['train_loss']:.4f} vl={t['valid_loss']:.4f} "
            f"ens={t['ens_mAP']:.4f}/{t['ens_mAUC']:.4f}"
        )
    print(f"wa: jax {jax_wa} | twin {twin_wa}")
    return cfg, jax_rows, jax_wa, twin_rows, twin_wa


# Stated tolerances: losses are continuous (f32 reduction-order + Adam
# sqrt(v) amplification drift, bounded ~2e-2 over 9 steps in the step
# tests); rank metrics on a 24-clip eval set move in quanta of ~1/6 per
# swapped pair per class, so a 0.08 band means "no more than spurious
# single-pair churn".
LOSS_TOL = 2.5e-2
RANK_TOL = 0.08


def test_result_trajectories_agree(protocol_runs):
    cfg, jax_rows, _, twin_rows, _ = protocol_runs
    assert jax_rows.shape == (N_EPOCHS, 10)
    for e in range(N_EPOCHS):
        j, t = jax_rows[e], twin_rows[e]
        assert abs(j[5] - t["train_loss"]) < LOSS_TOL, (e, j[5], t)
        assert abs(j[6] - t["valid_loss"]) < LOSS_TOL, (e, j[6], t)
        assert abs(j[0] - t["mAP"]) < RANK_TOL, (e, j[0], t)
        assert abs(j[1] - t["mAUC"]) < RANK_TOL, (e, j[1], t)


def test_ensemble_trajectory_agrees(protocol_runs):
    cfg, jax_rows, _, twin_rows, _ = protocol_runs
    for e in range(N_EPOCHS):
        j, t = jax_rows[e], twin_rows[e]
        assert abs(j[7] - t["ens_mAP"]) < RANK_TOL, (e, j[7], t)
        assert abs(j[8] - t["ens_mAUC"]) < RANK_TOL, (e, j[8], t)


def test_wa_numbers_agree(protocol_runs):
    _, _, jax_wa, _, twin_wa = protocol_runs
    assert abs(jax_wa[0] - twin_wa["wa_mAP"]) < RANK_TOL, (jax_wa, twin_wa)
    assert abs(jax_wa[1] - twin_wa["wa_mAUC"]) < RANK_TOL, (jax_wa, twin_wa)


def test_both_protocols_learn(protocol_runs):
    """Not just 'agree' — both full protocols actually train: final mAP
    beats 4-class chance on the separable-tone corpus on BOTH sides."""
    _, jax_rows, _, twin_rows, _ = protocol_runs
    assert jax_rows[-1, 0] > 0.4, jax_rows[:, 0]
    assert twin_rows[-1]["mAP"] > 0.4, [r["mAP"] for r in twin_rows]
    # the schedule really moved inside this run (warmup ramp and/or decay):
    # the recorded per-epoch lr column is not constant
    assert len(set(np.round(jax_rows[:, 9], 10))) > 1, jax_rows[:, 9]
