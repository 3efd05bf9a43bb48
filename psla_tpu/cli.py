"""Single training entry point (replaces the reference's run.sh + run.py).

Flag names mirror src/run.py:25-72 so reference users can port commands
directly; ``--preset`` pulls in a full recipe (egs/*/run.sh values,
SURVEY.md §6.3) with any explicit flag overriding it.

Example:
    python -m psla_tpu.cli --preset fsd50k \
        --data-train tr.json --data-val val.json --data-eval eval.json \
        --label-csv class_labels_indices.csv --exp-dir exp/fsd
"""

from __future__ import annotations

import argparse
import ast
import sys

import numpy as np

from psla_tpu.config import ExperimentConfig, PRESETS
from psla_tpu.data import (
    AudioLoader,
    LoaderConfig,
    compute_sample_weights,
    load_datafile,
)
from psla_tpu.train import Trainer
from psla_tpu.train.protocol import post_training_summary


def _bool(v):  # the reference parses booleans with ast.literal_eval (run.py:50)
    return bool(ast.literal_eval(str(v)))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--preset", choices=sorted(PRESETS), default=None)
    # I/O
    p.add_argument("--data-train", type=str, default="")
    p.add_argument("--data-val", type=str, default="")
    p.add_argument("--data-eval", type=str, default=None)
    p.add_argument("--label-csv", type=str, default="")
    p.add_argument("--exp-dir", type=str, default="")
    # optimization
    p.add_argument("-b", "--batch-size", type=int, default=None)
    p.add_argument("-w", "--num-workers", type=int, default=None)
    p.add_argument("--lr", "--learning-rate", type=float, default=None)
    p.add_argument("--weight-decay", "--wd", type=float, default=None)
    p.add_argument("--n-epochs", type=int, default=None)
    p.add_argument("--n-print-steps", type=int, default=None)
    p.add_argument("--warmup", type=_bool, default=None)
    p.add_argument("--lrscheduler_start", type=int, default=None)
    p.add_argument("--lrscheduler_decay", type=float, default=None)
    p.add_argument("--loss", choices=["BCE", "CE"], default=None)
    p.add_argument("--metrics", choices=["mAP", "acc"], default=None)
    # model
    p.add_argument("--model", choices=["efficientnet", "resnet", "mbnet"], default=None)
    p.add_argument("--eff_b", type=int, default=None)
    p.add_argument("--att_head", type=int, default=None)
    p.add_argument("--impretrain", type=_bool, default=None)
    p.add_argument("--pretrained-ckpt", type=str, default=None)
    p.add_argument("--n_class", type=int, default=None)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default=None)
    p.add_argument("--bn-momentum", type=float, default=None,
                   help="BatchNorm running-stat momentum, flax convention "
                        "(default 0.99 == the reference's torch 0.01, "
                        "Models.py:69-72). Lower it (e.g. 0.5) for short "
                        "runs whose eval-mode forward must reflect the "
                        "data before the default's ~1/(1-m) step warmup")
    # data / augmentation
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--dataset_mean", type=float, default=None)
    p.add_argument("--dataset_std", type=float, default=None)
    p.add_argument("--target_length", type=int, default=None)
    p.add_argument("--freqm", type=int, default=None)
    p.add_argument("--timem", type=int, default=None)
    p.add_argument("--mixup", type=float, default=None)
    p.add_argument("--noise", type=_bool, default=None)
    p.add_argument("--skip_norm", type=_bool, default=None,
                   help="skip mean/std normalization (new-dataset "
                        "onboarding: see psla_tpu.tools.compute_stats)")
    p.add_argument("--bal", type=_bool, default=None)
    # weight averaging
    p.add_argument("--wa", type=_bool, default=None)
    p.add_argument("--wa_start", type=int, default=None)
    p.add_argument("--wa_end", type=int, default=None)
    p.add_argument("--save_model", type=_bool, default=None)
    # engine
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--ensemble-seeds", type=int, default=None,
                   help="train E independent seeds in ONE program over a "
                        "2-D (ensemble, data) mesh (the TPU-native form "
                        "of the reference's multi-run ensembles, "
                        "README.md:206); any E on any device count — "
                        "gcd(E, n_devices) mesh shards, rest unrolled")
    p.add_argument("--fbank-method", choices=["auto", "fft", "gemm", "pallas"],
                   default=None)
    p.add_argument("--fbank-precision", choices=["highest", "high", "default"],
                   default=None,
                   help="MXU precision of the training fbank matmuls "
                        "(config default 'high' = bf16x3; 'highest' for "
                        "f32-parity runs)")
    p.add_argument("--act-compress", choices=["none", "q8save", "qdq"],
                   default=None,
                   help="int8 depthwise-activation compression experiment "
                        "(ops/qsave.py; see PERF.md for the verdict)")
    p.add_argument("--remat", type=_bool, default=None,
                   help="rematerialize MBConv blocks in backward (~3x lower "
                        "peak activation memory for ~18%% step time)")
    p.add_argument("--tensorboard", type=_bool, default=None,
                   help="write per-epoch scalars to {exp_dir}/tb")
    p.add_argument("--profile-steps", type=int, default=None,
                   help="capture a jax.profiler trace of this many train "
                        "steps into {exp_dir}/profile")
    p.add_argument("--profile-start-step", type=int, default=None)
    p.add_argument("--compilation-cache", type=str, default=None,
                   help="persistent XLA compilation cache dir (restarts "
                        "and pod relaunches skip the train-step compile)")
    p.add_argument("--wire", choices=["int16", "float32"], default=None,
                   help="host->device waveform wire format: 'int16' (raw "
                        "PCM wire, bit-exact for PCM16 sources, half the "
                        "transfer bytes — the default) or 'float32'")
    p.add_argument("--device-prefetch", type=int, default=None,
                   help="stage this many batches' host->device transfer "
                        "ahead of compute on a background thread "
                        "(0 disables)")
    return p


_ARG_TO_FIELD = {
    "data_train": "data_train", "data_val": "data_val", "data_eval": "data_eval",
    "label_csv": "label_csv", "exp_dir": "exp_dir", "batch_size": "batch_size",
    "num_workers": "num_workers", "lr": "lr", "weight_decay": "weight_decay",
    "n_epochs": "n_epochs", "n_print_steps": "n_print_steps", "warmup": "warmup",
    "lrscheduler_start": "lrscheduler_start",
    "lrscheduler_decay": "lrscheduler_decay", "loss": "loss",
    "metrics": "metrics", "model": "model", "eff_b": "eff_b",
    "att_head": "att_head", "impretrain": "impretrain",
    "pretrained_ckpt": "pretrained_ckpt", "n_class": "n_class",
    "dtype": "dtype", "bn_momentum": "bn_momentum",
    "dataset": "dataset", "dataset_mean": "dataset_mean",
    "dataset_std": "dataset_std", "target_length": "target_length",
    "freqm": "freqm", "timem": "timem", "mixup": "mixup", "noise": "noise",
    "skip_norm": "skip_norm",
    "bal": "bal", "wa": "wa", "wa_start": "wa_start", "wa_end": "wa_end",
    "save_model": "save_model", "seed": "seed", "num_devices": "num_devices",
    "ensemble_seeds": "ensemble_seeds",
    "fbank_method": "fbank_method", "fbank_precision": "fbank_precision",
    "act_compress": "act_compress",
    "remat": "remat", "tensorboard": "tensorboard",
    "profile_steps": "profile_steps",
    "profile_start_step": "profile_start_step",
    "compilation_cache": "compilation_cache",
    "wire": "wire", "device_prefetch": "device_prefetch",
}


def config_from_args(args) -> ExperimentConfig:
    kwargs = dict(PRESETS[args.preset]) if args.preset else {}
    for arg_name, field in _ARG_TO_FIELD.items():
        v = getattr(args, arg_name, None)
        if v is not None and v != "":
            kwargs[field] = v
    return ExperimentConfig(**kwargs)


def make_loaders(cfg: ExperimentConfig):
    from psla_tpu.parallel.distributed import process_info

    host_id, num_hosts = process_info()
    if cfg.ensemble_seeds > 1 and num_hosts > 1:
        # the ensemble mesh replicates the batch over the 'ensemble' axis,
        # so a host's data-stream shard is its position WITHIN its
        # ensemble row (hosts at the same position in different rows must
        # feed identical rows) — remap before building any loader
        import jax

        from psla_tpu.parallel.ensemble import ensemble_layout

        n_dev = cfg.num_devices or len(jax.devices())
        _, host_id, num_hosts = ensemble_layout(
            cfg.ensemble_seeds, n_dev, host_id, num_hosts
        )
    pre = cfg.preprocess_config()
    buf = pre.fbank.buffer_length(cfg.target_length)
    train_df = load_datafile(cfg.data_train, cfg.label_csv)
    val_df = load_datafile(cfg.data_val, cfg.label_csv)

    weights = compute_sample_weights(train_df) if cfg.bal else None
    if cfg.bal:
        print("balanced sampler is being used")
    train_loader = AudioLoader(
        train_df,
        LoaderConfig(
            batch_size=cfg.batch_size, buffer_samples=buf,
            num_workers=cfg.num_workers, mixup=cfg.mixup > 0, seed=cfg.seed,
            host_id=host_id, num_hosts=num_hosts, wire=cfg.wire,
        ),
        weights=weights,
    )
    val_loader = AudioLoader(
        val_df,
        LoaderConfig(
            batch_size=cfg.batch_size, buffer_samples=buf,
            num_workers=cfg.num_workers, drop_remainder=False,
            host_id=host_id, num_hosts=num_hosts, wire=cfg.wire,
        ),
        shuffle=False,
    )
    eval_loader = None
    if cfg.data_eval:
        eval_df = load_datafile(cfg.data_eval, cfg.label_csv)
        eval_loader = AudioLoader(
            eval_df,
            LoaderConfig(
                batch_size=cfg.batch_size * 2, buffer_samples=buf,
                num_workers=cfg.num_workers, drop_remainder=False,
                host_id=host_id, num_hosts=num_hosts, wire=cfg.wire,
            ),
            shuffle=False,
        )
    return train_loader, val_loader, eval_loader


def _pin_platform_from_env():
    """Re-assert the JAX_PLATFORMS env var into jax's config.

    Normally a no-op (the config's default IS the env var), but a site
    hook that pre-imports jax may have pinned another platform via
    jax.config.update — which silently overrides the env of any
    subprocess launch (`JAX_PLATFORMS=cpu python -m psla_tpu.cli ...`
    would still grab the site's device backend). Env-var semantics win.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        have = jax.config.jax_platforms or ""
        # only the PRIMARY platform matters: a site pin of "axon,cpu"
        # honors JAX_PLATFORMS=axon (extra fallbacks are harmless)
        if have.split(",")[0] != want.split(",")[0]:
            jax.config.update("jax_platforms", want)


def run(argv=None):
    """Library entry: parse, train, and return the post-training summary."""
    from psla_tpu.parallel.distributed import maybe_initialize

    _pin_platform_from_env()
    maybe_initialize()  # no-op unless launched on a pod / with a coordinator
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    if not cfg.label_csv:
        # bundled public vocabularies (the reference ships the same CSVs
        # in-repo at egs/*/class_labels_indices.csv)
        from psla_tpu import assets

        cfg.label_csv = assets.label_csv_for(cfg.dataset)
        print(f"using bundled label vocabulary: {cfg.label_csv}")
    if not cfg.exp_dir:
        cfg.exp_dir = (
            f"exp/Data-{cfg.dataset}_Model-{cfg.model}_LR-{cfg.lr}"
            f"_Epochs-{cfg.n_epochs}"
        )
    import jax

    print(f"jax backend: {jax.default_backend()} "
          f"({len(jax.devices())} device(s))", flush=True)
    train_loader, val_loader, eval_loader = make_loaders(cfg)
    if cfg.ensemble_seeds > 1:
        from psla_tpu.train.ensemble_loop import EnsembleTrainer

        trainer = EnsembleTrainer(cfg, train_loader, val_loader, eval_loader)
    else:
        trainer = Trainer(cfg, train_loader, val_loader, eval_loader)
    trainer.train(resume=args.resume)
    return post_training_summary(trainer, eval_loader)


def main(argv=None) -> int:
    """Console entry point (`psla-train`): setuptools wraps this in
    sys.exit(), so it must return 0/None on success — returning the
    summary dict would make every successful run exit with status 1."""
    run(argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
