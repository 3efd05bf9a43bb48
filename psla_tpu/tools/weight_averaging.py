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
