"""Dataset-stats tool (skip_norm onboarding loop, audioset_dataset.py:72-78).

Self-consistency: the tool's mean/std, fed back as dataset_mean/std, must
standardize the same data to ~N(0,1); and the --skip_norm CLI flag must
reach the config.
"""

import json

import numpy as np

import jax

from psla_tpu import cli
from psla_tpu.tools.compute_stats import compute_norm_stats
from tests.synth import build_corpus


def test_stats_standardize_the_corpus(tmp_path):
    datafile, label_csv = build_corpus(
        str(tmp_path), num_classes=2, clips_per_class=3, seconds=0.5,
        multi_label_frac=0.0,
    )
    mean, std = compute_norm_stats(
        datafile, label_csv, target_length=48, batch_size=4, num_workers=1,
    )
    assert np.isfinite(mean) and np.isfinite(std) and std > 0
    # log-mels of quiet-ish tones are well below zero (log energy domain)
    assert mean < 0

    # re-run the SAME preprocessing manually, normalized with the tool's
    # stats: result must be ~zero-mean unit-std
    from psla_tpu.data import AudioLoader, LoaderConfig, load_datafile
    from psla_tpu.frontend.fbank import FbankConfig
    from psla_tpu.frontend.pipeline import (
        PreprocessConfig,
        WavBatch,
        preprocess_eval,
    )

    pre = PreprocessConfig(
        fbank=FbankConfig(),
        target_length=48, freq_mask=0, time_mask=0, mixup_rate=0.0,
        norm_mean=mean, norm_std=std,
    ).eval_variant()
    df = load_datafile(datafile, label_csv)
    loader = AudioLoader(
        df,
        LoaderConfig(batch_size=4, buffer_samples=pre.fbank.buffer_length(48),
                     num_workers=1, drop_remainder=False),
        shuffle=False,
    )
    vals = []
    for b in loader:
        wb = WavBatch(
            wav=b["wav"], wav_mean=b["wav_mean"], length=b["length"],
            labels=b["labels"], mix_wav=b["wav"], mix_wav_mean=b["wav_mean"],
            mix_length=b["length"], mix_labels=b["labels"],
        )
        out = np.asarray(preprocess_eval(wb, pre))[: int(b["n_valid"])]
        vals.append(out.ravel())
    x = np.concatenate(vals)
    assert abs(x.mean()) < 1e-3
    np.testing.assert_allclose(x.std(), 1.0, atol=1e-3)


def test_stats_no_label_csv(tmp_path):
    """Labels are irrelevant to stats: datafile alone must suffice."""
    datafile, label_csv = build_corpus(
        str(tmp_path), num_classes=2, clips_per_class=2, seconds=0.5,
        multi_label_frac=0.0,
    )
    m1, s1 = compute_norm_stats(datafile, label_csv, target_length=48,
                                batch_size=4, num_workers=1)
    m2, s2 = compute_norm_stats(datafile, None, target_length=48,
                                batch_size=4, num_workers=1)
    assert (m1, s1) == (m2, s2)


def test_skip_norm_cli_flag():
    args = cli.build_parser().parse_args(
        ["--skip_norm", "True", "--data-train", "x.json"]
    )
    cfg = cli.config_from_args(args)
    assert cfg.skip_norm is True
    assert cfg.preprocess_config().skip_norm is True
