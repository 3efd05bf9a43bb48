"""Dataset log-mel normalization statistics — the skip_norm onboarding loop.

The reference documents the workflow for onboarding a NEW dataset
(src/dataloaders/audioset_dataset.py:72-78): run with ``skip_norm`` so
fbanks come out unnormalized, measure their mean/std, then train with
``--dataset_mean/--dataset_std`` — but ships no tool for the measuring
step. This tool closes that loop:

    python -m psla_tpu.tools.compute_stats --datafile tr.json \
        [--label-csv labels.csv] [--target_length 1056]

Prints the mean/std of the UNNORMALIZED log-mel values over the datafile
(computed exactly as training sees them: DC removal -> kaldi fbank ->
pad/cut to target_length, the reference's stat domain) and the flags to
pass to training.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def compute_norm_stats(
    datafile: str,
    label_csv: str | None = None,
    target_length: int = 1056,
    num_mel_bins: int = 128,
    sample_rate: int = 16000,
    batch_size: int = 32,
    num_workers: int = 4,
    limit: int | None = None,
    fbank_method: str = "auto",
) -> tuple[float, float]:
    """Streaming mean/std of unnormalized log-mels over a datafile."""
    import jax
    import jax.numpy as jnp

    from psla_tpu.data import AudioLoader, LoaderConfig, load_datafile
    from psla_tpu.frontend.fbank import FbankConfig
    from psla_tpu.frontend.pipeline import (
        PreprocessConfig,
        WavBatch,
        preprocess_eval,
    )

    pre = PreprocessConfig(
        fbank=FbankConfig(
            sample_frequency=float(sample_rate), num_mel_bins=num_mel_bins
        ),
        target_length=target_length,
        freq_mask=0, time_mask=0, mixup_rate=0.0, noise=False,
        skip_norm=True,
        fbank_method=fbank_method,
    ).eval_variant()
    if label_csv:
        df = load_datafile(datafile, label_csv)
    else:
        # stats don't need labels: derive a vocabulary from the datafile
        from psla_tpu.data.datafiles import Datafile

        with open(datafile) as f:
            entries = json.load(f)["data"]
        mids = sorted({
            m
            for e in entries
            for m in str(e.get("labels", "")).split(",")
            if m
        })
        df = Datafile(entries=entries,
                      index_dict={m: i for i, m in enumerate(mids)})
    loader = AudioLoader(
        df,
        LoaderConfig(
            batch_size=batch_size,
            buffer_samples=pre.fbank.buffer_length(target_length),
            num_workers=num_workers, drop_remainder=False,
        ),
        shuffle=False,
    )

    fields = ("wav", "wav_mean", "length", "labels")

    @jax.jit
    def stats_step(batch):
        wb = WavBatch(
            **{k: batch[k] for k in fields},
            mix_wav=batch["wav"], mix_wav_mean=batch["wav_mean"],
            mix_length=batch["length"], mix_labels=batch["labels"],
        )
        logmel = preprocess_eval(wb, pre)  # [B, T, F], unnormalized
        # mask padded tail rows of the batch (n_valid), keep time padding
        # (the reference's stat domain includes the pad-to-target_length)
        valid = (
            jnp.arange(logmel.shape[0]) < batch["n_valid"]
        ).astype(jnp.float32)
        x = logmel.astype(jnp.float32) * valid[:, None, None]
        per_clip = logmel.shape[1] * logmel.shape[2]
        return (
            jnp.sum(x), jnp.sum(x * x),
            batch["n_valid"].astype(jnp.float32) * per_clip,
        )

    s1 = s2 = n = 0.0
    seen = 0
    for host_batch in loader:
        b1, b2, bn = stats_step(
            {k: host_batch[k] for k in fields + ("n_valid",)}
        )
        s1 += float(b1)
        s2 += float(b2)
        n += float(bn)
        seen += int(host_batch["n_valid"])
        if limit is not None and seen >= limit:
            break
    mean = s1 / n
    var = max(s2 / n - mean * mean, 0.0)
    return float(mean), float(np.sqrt(var))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--datafile", required=True)
    p.add_argument("--label-csv", default=None)
    p.add_argument("--dataset", default=None,
                   help="use the bundled vocabulary for this dataset "
                        "when --label-csv is not given")
    p.add_argument("--target_length", type=int, default=1056)
    p.add_argument("--num_mel_bins", type=int, default=128)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--limit", type=int, default=None,
                   help="stop after ~this many clips (estimate mode)")
    p.add_argument("--json", action="store_true", help="machine output")
    args = p.parse_args(argv)

    label_csv = args.label_csv
    if label_csv is None and args.dataset:
        from psla_tpu import assets

        label_csv = assets.label_csv_for(args.dataset)
    mean, std = compute_norm_stats(
        args.datafile, label_csv,
        target_length=args.target_length, num_mel_bins=args.num_mel_bins,
        sample_rate=args.sample_rate, batch_size=args.batch_size,
        num_workers=args.num_workers, limit=args.limit,
    )
    if args.json:
        print(json.dumps({"dataset_mean": mean, "dataset_std": std}))
    else:
        print(f"log-mel mean {mean:.4f} std {std:.4f}")
        print(f"train with: --dataset_mean {mean:.4f} --dataset_std {std:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
