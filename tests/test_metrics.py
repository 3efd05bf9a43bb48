"""Metric parity vs sklearn (the reference's metric backend,
src/utilities/stats.py) — exact to float64 rounding."""

import numpy as np
import pytest
from sklearn import metrics as skm

from psla_tpu.metrics import calculate_stats, d_prime, mean_average_precision
from psla_tpu.metrics.stats import (
    average_precision,
    precision_recall_curve,
    roc_auc,
    roc_curve,
)


def _fake_scores(n=400, c=7, seed=0, ties=False):
    rng = np.random.RandomState(seed)
    target = (rng.rand(n, c) < 0.15).astype(np.float64)
    # ensure every class has at least one positive and one negative
    target[0, :] = 1.0
    target[1, :] = 0.0
    logits = rng.randn(n, c) + 2.0 * target
    scores = 1.0 / (1.0 + np.exp(-logits))
    if ties:
        scores = np.round(scores, 1)  # heavy ties
    return scores, target


@pytest.mark.parametrize("ties", [False, True])
def test_ap_auc_match_sklearn(ties):
    scores, target = _fake_scores(ties=ties)
    for k in range(scores.shape[1]):
        ap = average_precision(scores[:, k], target[:, k])
        ap_ref = skm.average_precision_score(target[:, k], scores[:, k])
        assert abs(ap - ap_ref) < 1e-12
        auc = roc_auc(scores[:, k], target[:, k])
        auc_ref = skm.roc_auc_score(target[:, k], scores[:, k])
        assert abs(auc - auc_ref) < 1e-12


@pytest.mark.parametrize("ties", [False, True])
def test_curves_match_sklearn(ties):
    scores, target = _fake_scores(ties=ties)
    for k in range(scores.shape[1]):
        p, r, t = precision_recall_curve(scores[:, k], target[:, k])
        p_ref, r_ref, t_ref = skm.precision_recall_curve(target[:, k], scores[:, k])
        np.testing.assert_allclose(p, p_ref, atol=1e-12)
        np.testing.assert_allclose(r, r_ref, atol=1e-12)
        np.testing.assert_allclose(t, t_ref, atol=1e-12)

        fpr, tpr, th = roc_curve(scores[:, k], target[:, k])
        fpr_ref, tpr_ref, th_ref = skm.roc_curve(target[:, k], scores[:, k])
        np.testing.assert_allclose(fpr, fpr_ref, atol=1e-12)
        np.testing.assert_allclose(tpr, tpr_ref, atol=1e-12)
        np.testing.assert_allclose(th, th_ref, atol=1e-12)


def test_calculate_stats_contract():
    scores, target = _fake_scores()
    stats = calculate_stats(scores, target, curve_subsample=10)
    assert len(stats) == scores.shape[1]
    for s in stats:
        assert set(s) == {"precisions", "recalls", "AP", "fpr", "fnr", "auc", "acc"}
    m = np.mean([s["AP"] for s in stats])
    assert abs(m - mean_average_precision(scores, target)) < 1e-12
    # acc equals sklearn accuracy of argmaxes
    acc_ref = skm.accuracy_score(np.argmax(target, 1), np.argmax(scores, 1))
    assert abs(stats[0]["acc"] - acc_ref) < 1e-12


def test_d_prime():
    assert abs(d_prime(0.5)) < 1e-12
    assert d_prime(0.9) > 1.8  # sqrt(2)*1.2816 = 1.8124
    assert abs(d_prime(0.9) - np.sqrt(2) * 1.2815515655446004) < 1e-9


def test_degenerate_classes():
    # all-negative class: AP == 0 (sklearn warns, returns 0 with zero_division)
    scores = np.array([[0.2], [0.9], [0.4]])
    target = np.zeros((3, 1))
    assert average_precision(scores[:, 0], target[:, 0]) == 0.0
    assert np.isnan(roc_auc(scores[:, 0], target[:, 0]))
