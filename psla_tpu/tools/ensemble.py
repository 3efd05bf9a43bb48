"""Multi-model ensemble evaluation (reference: src/ensemble/ensemble.py).

Runs N checkpoints over an eval loader, writes per-model prediction CSVs,
then scores the mean prediction matrix — the protocol behind the paper's
headline 0.474 mAP (10-model ensemble). Model inputs can be psla_tpu orbax
checkpoints or reference .pth files (converted on the fly, with the
'module.'/_fc key normalization of ensemble.py:35-38 handled by
models.convert).

TPU-native serving path: the default is a STACKED pass — all E members'
params stacked along a leading axis (shard_map'd over the mesh's
'ensemble' axis, local members unrolled as plain-conv forwards — NOT
vmapped: see parallel/ensemble.py for the GSPMD miscompile + MXU
rationale), so the eval loader is traversed once, each batch's
host->device transfer and on-device fbank happen once, and the E forwards
run back-to-back inside one XLA program. The reference (and
`--sequential`) runs E independent full passes instead.
"""

from __future__ import annotations

import os

import numpy as np

from psla_tpu.metrics import calculate_stats, d_prime
from psla_tpu.models import create_model
from psla_tpu.models.convert import load_pth
from psla_tpu.parallel.mesh import make_mesh, shard_batch
from psla_tpu.train.state import TrainState
from psla_tpu.train.step import build_eval_step


def _load_variables(path: str, model_name: str, n_class: int):
    if path.endswith(".pth"):
        return load_pth(path, model_name, n_class)
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    if "params" in tree:
        return {"params": tree["params"], "batch_stats": tree.get("batch_stats", {})}
    raise ValueError(f"{path}: unrecognized checkpoint layout")


def predict(model, variables, loader, pre_config, mesh=None) -> tuple[np.ndarray, np.ndarray]:
    """Run one model over a loader -> (predictions [N,C], targets [N,C])."""
    import jax
    import jax.numpy as jnp

    if mesh is None:
        mesh = make_mesh()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=(),
    )
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    eval_step = build_eval_step(model, pre_config, mesh=mesh)
    preds, targets = [], []
    for host_batch in loader:
        n_valid = int(host_batch["n_valid"])
        out, _ = eval_step(state, shard_batch(host_batch, mesh))
        preds.append(np.asarray(out)[:n_valid])
        targets.append(host_batch["labels"][:n_valid])
    return np.concatenate(preds), np.concatenate(targets)


def predict_stacked(
    model, variables_list, loader, pre_config, mesh=None
) -> tuple[np.ndarray, np.ndarray]:
    """One stacked pass for all E members -> (predictions [E,N,C], targets).

    The members' param/batch_stats trees are stacked along a leading axis
    (sharded over the mesh's 'ensemble' axis, replicated when that axis is
    size 1) and the shared batch is broadcast: host decode, transfer, and
    the on-device fbank run once per batch instead of once per member.
    Requires all checkpoints to share one architecture (always true for
    the reference ensemble protocol, ensemble.py:19-31 lists one arch).
    """
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from psla_tpu.parallel.ensemble import build_ensemble_eval_step

    if mesh is None or "ensemble" not in mesh.axis_names:
        devices = np.asarray(jax.devices())
        mesh = Mesh(devices.reshape(1, -1), ("ensemble", "data"))
    params = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *[v["params"] for v in variables_list],
    )
    bstats = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *[v.get("batch_stats", {}) for v in variables_list],
    )
    ens = NamedSharding(mesh, P("ensemble"))
    params = jax.device_put(params, ens)
    bstats = jax.device_put(bstats, ens)
    eval_step = build_ensemble_eval_step(
        model, pre_config, "BCE", mesh, len(variables_list)
    )
    preds, targets = [], []
    for host_batch in loader:
        n_valid = int(host_batch["n_valid"])
        out, _ = eval_step(params, bstats, shard_batch(host_batch, mesh))
        preds.append(np.asarray(out)[:, :n_valid])
        targets.append(host_batch["labels"][:n_valid])
    return np.concatenate(preds, axis=1), np.concatenate(targets)


def ensemble_eval(
    checkpoints: list[str],
    loader,
    pre_config,
    model_name: str = "efficientnet",
    n_class: int = 527,
    eff_b: int = 2,
    att_head: int = 4,
    out_dir: str | None = None,
    stacked: bool = True,
) -> dict:
    """Evaluate each checkpoint, then the mean of their predictions
    (ensemble.py:52-68). Returns per-model and ensemble mAP/AUC."""
    model = create_model(model_name, label_dim=n_class, eff_b=eff_b, head_num=att_head)
    all_variables = [
        _load_variables(ckpt, model_name, n_class) for ckpt in checkpoints
    ]
    if stacked:
        import jax

        structs = {
            jax.tree.structure(v["params"]) for v in all_variables
        }
        if len(structs) > 1:
            print("checkpoint param trees differ; falling back to sequential")
            stacked = False
    summed = None
    target = None
    per_model = []
    if stacked:
        all_preds, target = predict_stacked(
            model, all_variables, loader, pre_config
        )
    else:
        mesh = make_mesh()
        all_preds = None
    for i, ckpt in enumerate(checkpoints):
        if stacked:
            pred = all_preds[i]
        else:
            pred, target = predict(
                model, all_variables[i], loader, pre_config, mesh
            )
        stats = calculate_stats(pred, target)
        m = float(np.mean([s["AP"] for s in stats]))
        a = float(np.nanmean([s["auc"] for s in stats]))
        per_model.append({"ckpt": ckpt, "mAP": m, "mAUC": a})
        print(f"model {i} ({ckpt}): mAP {m:.6f} AUC {a:.6f}")
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            np.savetxt(
                os.path.join(out_dir, f"predictions_{i}.csv"), pred, delimiter=","
            )
            if i == 0:
                np.savetxt(os.path.join(out_dir, "target.csv"), target, delimiter=",")
        summed = pred if summed is None else summed + pred

    ensemble_pred = summed / len(checkpoints)
    stats = calculate_stats(ensemble_pred, target)
    m = float(np.mean([s["AP"] for s in stats]))
    a = float(np.nanmean([s["auc"] for s in stats]))
    print(f"ensemble of {len(checkpoints)}: mAP {m:.6f} AUC {a:.6f} "
          f"d_prime {d_prime(a):.6f}")
    return {"models": per_model, "ensemble": {"mAP": m, "mAUC": a}}


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
    p.add_argument("--out-dir", default=None)
    p.add_argument("--sequential", action="store_true",
                   help="one full eval pass per model (reference behavior) "
                        "instead of the stacked single-pass default")
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
    res = ensemble_eval(
        args.checkpoints, loader, pre, model_name=args.model,
        n_class=n_class, eff_b=args.eff_b, att_head=args.att_head,
        out_dir=args.out_dir, stacked=not args.sequential,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
