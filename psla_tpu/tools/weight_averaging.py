"""Offline checkpoint weight averaging (reference: src/ensemble/
weight_averaging.py).

Averages params + batch_stats across an arbitrary list of checkpoints
(orbax dirs or reference .pth files) and evaluates the averaged model.
Unlike the in-training path (train/loop.py:weight_average) this operates on
any external checkpoint set, mirroring the reference's standalone script
(weight_averaging.py:19-60, which averages checkpoints 16..30 of a
downloaded run).
"""

from __future__ import annotations

import numpy as np

from psla_tpu.metrics import calculate_stats
from psla_tpu.models import create_model
from psla_tpu.tools.ensemble import _load_variables, predict


def average_variables(variable_trees: list[dict]) -> dict:
    """Arithmetic mean of N variable trees (correct 1/N — the reference's
    in-training variant divides by N+1, traintest.py:302-315)."""
    import jax

    total = variable_trees[0]
    for tree in variable_trees[1:]:
        total = jax.tree.map(np.add, total, tree)
    return jax.tree.map(lambda x: x / len(variable_trees), total)


def weight_average_eval(
    checkpoints: list[str],
    loader,
    pre_config,
    model_name: str = "efficientnet",
    n_class: int = 527,
    eff_b: int = 2,
    att_head: int = 4,
) -> dict:
    variables = average_variables(
        [_load_variables(c, model_name, n_class) for c in checkpoints]
    )
    model = create_model(model_name, label_dim=n_class, eff_b=eff_b, head_num=att_head)
    pred, target = predict(model, variables, loader, pre_config)
    stats = calculate_stats(pred, target)
    m = float(np.mean([s["AP"] for s in stats]))
    a = float(np.nanmean([s["auc"] for s in stats]))
    print(f"weight-averaged {len(checkpoints)} ckpts: mAP {m:.6f} AUC {a:.6f}")
    return {"mAP": m, "mAUC": a, "variables": variables}


def main(argv=None):
    """CLI: evaluate checkpoints on an eval datafile (reference runs these
    as standalone scripts, src/ensemble/)."""
    import argparse

    from psla_tpu.config import from_preset, ExperimentConfig, PRESETS
    from psla_tpu.data.datafiles import load_datafile
    from psla_tpu.data.loader import AudioLoader, LoaderConfig

    p = argparse.ArgumentParser()
    p.add_argument("checkpoints", nargs="+",
                   help="orbax checkpoint dirs or reference .pth files")
    p.add_argument("--data-eval", required=True)
    p.add_argument("--label-csv", required=True)
    p.add_argument("--preset", choices=sorted(PRESETS), default=None)
    p.add_argument("--model", default="efficientnet")
    p.add_argument("--eff_b", type=int, default=2)
    p.add_argument("--att_head", type=int, default=4)
    p.add_argument("--n_class", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--target_length", type=int, default=None)
    args = p.parse_args(argv)

    cfg = from_preset(args.preset) if args.preset else ExperimentConfig()
    n_class = args.n_class or cfg.n_class
    if args.target_length:
        cfg = __import__("dataclasses").replace(cfg, target_length=args.target_length)
    pre = cfg.preprocess_config().eval_variant()
    df = load_datafile(args.data_eval, args.label_csv)
    loader = AudioLoader(
        df,
        LoaderConfig(
            batch_size=args.batch_size or cfg.batch_size,
            buffer_samples=pre.fbank.buffer_length(cfg.target_length),
            drop_remainder=False,
        ),
        shuffle=False,
    )
    res = weight_average_eval(
        args.checkpoints, loader, pre, model_name=args.model,
        n_class=n_class, eff_b=args.eff_b, att_head=args.att_head,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
