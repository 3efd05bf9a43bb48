"""Training/validation engine: the reference train-loop protocol, TPU-native.

Reimplements the behavior of src/traintest.py on top of the jitted sharded
steps: per-epoch train + validate, running checkpoint-ensemble of
prediction CSVs, 10-column result.csv rows, best/per-epoch checkpoints
(orbax), NaN-divergence abort, per-sample data/DNN timing meters, and
end-of-training weight averaging. Adds what the reference lacks
(SURVEY.md §5.4): bit-exact mid-run resume — step/optimizer state restore
plus deterministic RNG (fold_in-derived keys) and epoch-keyed sampling,
so a resumed run replays the uninterrupted run's trajectory exactly
(tested to atol=0 in tests/test_train.py).

Artifact layout under exp_dir mirrors the reference:
  result.csv, wa_result.csv, stats_{epoch}.pickle, progress.json,
  predictions/{target.csv, predictions_{e}.csv, ensemble_predictions.csv},
  models/{epoch_N/, best/, wa/} (orbax checkpoint dirs instead of .pth).

Deliberate deviations (SURVEY.md §7.4): weight averaging divides by the
true checkpoint count (the reference's validate_wa divides by N+1,
traintest.py:302-315); the honored flags noted in config.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from psla_tpu.config import ExperimentConfig
from psla_tpu.data.loader import AudioLoader
from psla_tpu.metrics import calculate_stats, d_prime
from psla_tpu.data.device_prefetch import prefetch_to_device
from psla_tpu.models import create_model
from psla_tpu.parallel.distributed import (
    allgather_host,
    broadcast_floats,
    is_primary,
    make_global_batch,
)
from psla_tpu.parallel.mesh import make_mesh
from psla_tpu.train.meters import AverageMeter
from psla_tpu.train.optim import make_optimizer, psla_lr_schedule
from psla_tpu.train.state import TrainState
from psla_tpu.train.step import build_eval_step, build_train_step


class Trainer:
    def __init__(
        self,
        config: ExperimentConfig,
        train_loader: AudioLoader,
        val_loader: AudioLoader,
        eval_loader: AudioLoader | None = None,
    ):
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.eval_loader = eval_loader

        self.exp_dir = os.path.abspath(config.exp_dir)
        os.makedirs(os.path.join(self.exp_dir, "models"), exist_ok=True)
        os.makedirs(os.path.join(self.exp_dir, "predictions"), exist_ok=True)
        config.save(os.path.join(self.exp_dir, "config.json"))

        if config.compilation_cache:
            # persistent XLA cache: a restarted/resumed run (or a pod
            # relaunch) skips the multi-10s train-step compile
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.abspath(config.compilation_cache),
            )

        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        self.model = create_model(
            config.model,
            label_dim=config.n_class,
            eff_b=config.eff_b,
            head_num=config.att_head,
            dtype=dtype,
            bn_momentum=config.bn_momentum,
            remat=config.remat,
            act_compress=config.act_compress,
        )
        self.pre_config = config.preprocess_config()

        self.steps_per_epoch = max(1, train_loader.batches_per_epoch())
        self.schedule = psla_lr_schedule(
            config.lr,
            self.steps_per_epoch,
            lrscheduler_start=config.lrscheduler_start,
            lrscheduler_decay=config.lrscheduler_decay,
            warmup=config.warmup,
            warmup_steps=config.warmup_steps,
            warmup_update_every=config.warmup_update_every,
        )
        self.tx = make_optimizer(self.schedule, config.weight_decay)
        self._build_steps()
        self.rng = jax.random.PRNGKey(config.seed)
        self._ckpt = ocp.PyTreeCheckpointer()
        self._profiling = False
        self._tb = None
        # target CSVs this process has (re)written: the first write of
        # each per process OVERWRITES, so reusing an exp_dir never scores
        # new predictions against a stale target matrix from an old run
        self._targets_refreshed: set[str] = set()

    def _build_steps(self):
        """Mesh + jitted step construction. Overridden by EnsembleTrainer
        (2-D ensemble mesh + shard_map'd multi-seed steps) so each
        trainer builds its execution exactly once."""
        cfg = self.config
        self.mesh = make_mesh(cfg.num_devices)
        self.train_step = build_train_step(
            self.model, self.tx, self.pre_config, cfg.loss, mesh=self.mesh
        )
        self.eval_step = build_eval_step(
            self.model, self.pre_config, cfg.loss, mesh=self.mesh
        )

    # ------------------------------------------------------ tensorboard

    def _tb_writer(self):
        """Lazy SummaryWriter into {exp_dir}/tb (config.tensorboard,
        rank 0 only). Returns None when disabled or unavailable."""
        if not self.config.tensorboard or not is_primary():
            return None
        if self._tb is None:
            try:
                from torch.utils.tensorboard import SummaryWriter
            except ImportError:
                print("tensorboard requested but not importable; skipping")
                self.config = dataclasses.replace(
                    self.config, tensorboard=False
                )
                return None
            self._tb = SummaryWriter(os.path.join(self.exp_dir, "tb"))
        return self._tb

    def _tb_epoch(self, epoch: int, scalars: dict):
        tb = self._tb_writer()
        if tb is None:
            return
        for k, v in scalars.items():
            tb.add_scalar(k, v, epoch)
        tb.flush()

    # ------------------------------------------------------------- state

    def init_state(self) -> TrainState:
        cfg = self.config
        example = jnp.zeros(
            (1, cfg.target_length, cfg.num_mel_bins), jnp.float32
        )
        # fixed derivation (not stateful splitting): init and train keys
        # must not depend on whether init_state ran, or a resumed run's
        # augmentation/dropout stream would diverge from the original
        init_key = jax.random.fold_in(self.rng, 0)
        variables = self.model.init(init_key, example, train=False)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        if cfg.pretrained_ckpt:
            params, batch_stats = self._load_pretrained(
                cfg.pretrained_ckpt, variables
            )
        elif cfg.impretrain:
            # turnkey ImageNet pretraining (the reference's silent
            # auto-download at Models.py:69-72): resolve the standard
            # checkpoint from cache/env/download, or fail LOUDLY — never
            # silently train from scratch under impretrain=True
            from psla_tpu.models.pretrained import resolve_imagenet_checkpoint

            path = resolve_imagenet_checkpoint(cfg.model, cfg.eff_b)
            print(f"loading ImageNet pretrained backbone: {path}")
            params, batch_stats = self._load_pretrained(path, variables)
        opt_state = self.tx.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return jax.device_put(
            state, jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        )

    def _load_pretrained(self, path: str, init_variables):
        """init_variables: the freshly initialized model variables — reused
        for backbone-only checkpoints (pretrained effnet + fresh head)."""
        payload = self._read_pretrained(path)
        variables = self._convert_pretrained(payload, init_variables)
        return variables["params"], variables.get("batch_stats", {})

    def _read_pretrained(self, path: str):
        """Load a pretrained source once (torch .pth state dict or a
        psla_tpu orbax checkpoint) — split from the conversion so the
        ensemble trainer can convert the same payload once per seed."""
        if path.endswith(".pth"):
            import torch

            return "pth", torch.load(path, map_location="cpu", weights_only=False)
        variables = self._ckpt.restore(os.path.abspath(path))
        if "params" not in variables:
            raise ValueError(f"{path}: not a psla_tpu checkpoint")
        return "ckpt", variables

    def _convert_pretrained(self, payload, init_variables):
        """Convert a `_read_pretrained` payload against one model init.
        Fresh-from-init leaves (pooling head; the 1-channel stem for
        resnet/mbnet) come from ``init_variables``."""
        kind, data = payload
        if kind == "ckpt":
            return data

        from psla_tpu.models.convert import (
            convert_checkpoint,
            normalize_state_dict,
        )
        from psla_tpu.models.pretrained import convert_imagenet_state_dict

        sd = data
        norm_keys = list(normalize_state_dict(sd))
        has_head = any("attention" in k for k in norm_keys)
        model = self.config.model
        is_backbone_only = (
            not has_head
            if model in ("efficientnet", "resnet")
            # raw torchvision mobilenet_v2 (no 'model.' wrapper prefix)
            else not any(k.startswith("model.") for k in norm_keys)
        )
        if is_backbone_only:
            # ImageNet backbone-only checkpoint (PSLA's "P"): pretrained
            # backbone + fresh pooling head from the model init
            return convert_imagenet_state_dict(sd, model, init_variables)
        return convert_checkpoint(sd, self.config.model, self.config.n_class)

    @staticmethod
    def _host_step(state: TrainState) -> int:
        """Global step as a host int (works for [E]-stacked ensemble
        states too, whose seeds advance in lockstep)."""
        step = state.step
        if isinstance(step, jax.Array) and not step.is_fully_addressable:
            # ensemble axis spans hosts: seeds advance in lockstep, so any
            # locally addressable shard carries the value (no collective)
            step = step.addressable_shards[0].data
        return int(np.max(np.asarray(step)))

    @staticmethod
    def _host_fetch(x):
        """State leaf -> host numpy. Leaves whose shards span other hosts
        (the ensemble axis across a pod) are allgathered — a COLLECTIVE,
        so every host must reach the caller in the same order."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return allgather_host(x)
        return np.asarray(x)

    # ------------------------------------------------------- checkpointing

    def _ckpt_dir(self, tag) -> str:
        return os.path.join(self.exp_dir, "models", str(tag))

    def save_checkpoint(self, state: TrainState, tag):
        # fetch BEFORE the rank gate: when the ensemble axis spans hosts
        # the stacked leaves are not fully addressable and _host_fetch is
        # a collective every host must join (replicated single-model
        # states take the plain local np.asarray path).
        host_tree = {
            "step": self._host_fetch(state.step),
            "params": jax.tree.map(self._host_fetch, state.params),
            "batch_stats": jax.tree.map(self._host_fetch, state.batch_stats),
            "opt_state": jax.tree.map(self._host_fetch, state.opt_state),
        }
        # rank 0 clears any stale dir alone (concurrent rmtree would race
        # on a shared exp_dir), with a barrier so no host enters the save
        # against a half-deleted path...
        path = self._ckpt_dir(tag)
        if is_primary() and os.path.exists(path):
            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"psla_ckpt_clear_{tag}")
        # ...then EVERY process calls save: orbax coordinates multihost
        # saves internally (sync_global_processes at start/commit; only
        # process 0 writes the replicated host data), so a rank-gated
        # call would desynchronize its barrier names and crash.
        self._ckpt.save(path, host_tree)

    def restore_checkpoint(self, tag) -> TrainState:
        tree = self._ckpt.restore(self._ckpt_dir(tag))
        # orbax restores pytrees as plain dicts; rebuild the optax state
        # structure (NamedTuples) from the leaves in tree order.
        opt_template = self.tx.init(tree["params"])
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_template), jax.tree.leaves(tree["opt_state"])
        )
        state = TrainState(
            step=jnp.asarray(tree["step"]),
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=opt_state,
        )
        # per-leaf placement hook: host arrays go STRAIGHT to their final
        # sharding (the ensemble subclass shards stacked leaves over the
        # 'ensemble' axis here — replicating E seeds' Adam state on every
        # device first would be a transient ExE memory spike)
        return jax.tree.map(
            lambda x: jax.device_put(x, self._state_placement(x)), state
        )

    def _state_placement(self, x):
        """Target sharding for one restored-state leaf (host array)."""
        del x  # single-model states are replicated wholesale
        return jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()
        )

    # ----------------------------------------------------------- profiling

    def _profile_tick(self, gstep: int):
        """Start/stop a jax.profiler trace window around the configured
        steps (config.profile_steps / profile_start_step). Device timelines
        land in {exp_dir}/profile for xprof/tensorboard; complements the
        reference-style per-sample data/DNN wall-clock meters."""
        cfg = self.config
        if not cfg.profile_steps:
            return
        if not self._profiling and gstep == cfg.profile_start_step:
            jax.profiler.start_trace(os.path.join(self.exp_dir, "profile"))
            self._profiling = True
        elif (
            self._profiling
            and gstep >= cfg.profile_start_step + cfg.profile_steps
        ):
            jax.profiler.stop_trace()
            self._profiling = False
            self.config = dataclasses.replace(cfg, profile_steps=0)

    def _profile_flush(self):
        """Close a still-open trace window (short epochs / early return)."""
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            self.config = dataclasses.replace(self.config, profile_steps=0)

    def _progress_path(self):
        return os.path.join(self.exp_dir, "progress.json")

    def _load_progress(self):
        if os.path.exists(self._progress_path()):
            with open(self._progress_path()) as f:
                return json.load(f)
        return {
            "epoch": 0,
            "global_step": 0,
            "best_epoch": 0,
            "best_metric": -float("inf"),
            "best_ensemble_epoch": 0,
            "best_ensemble_metric": -float("inf"),
            "history": [],
        }

    def _save_progress(self, progress):
        with open(self._progress_path(), "w") as f:
            json.dump(progress, f, indent=1)

    # ------------------------------------------------------------ training

    def train(self, resume: bool = False) -> TrainState:
        cfg = self.config
        progress = self._load_progress()
        if resume and progress["epoch"] > 0:
            tag = f"epoch_{progress['epoch']}"
            if os.path.isdir(self._ckpt_dir(tag)):
                state = self.restore_checkpoint(tag)
                print(f"resumed from epoch {progress['epoch']}")
            else:
                # per-epoch checkpoints are deleted by weight averaging
                # when save_model=False (traintest.py:310-311 semantics)
                fallback = next(
                    (t for t in ("wa", "best")
                     if os.path.isdir(self._ckpt_dir(t))), None,
                )
                if progress["epoch"] >= cfg.n_epochs and fallback:
                    # run already completed (incl. wa); nothing to train
                    state = self.restore_checkpoint(fallback)
                    print(
                        f"resume: per-epoch checkpoints were deleted "
                        f"(save_model=False) and training is complete; "
                        f"loaded '{fallback}'"
                    )
                    return state
                raise FileNotFoundError(
                    f"cannot resume: models/{tag} is missing (per-epoch "
                    "checkpoints are deleted by weight averaging when "
                    "save_model=False). Keep save_model=True for "
                    "resumable runs, or restart without --resume."
                )
        else:
            progress = {
                "epoch": 0, "global_step": 0, "best_epoch": 0,
                "best_metric": -float("inf"), "best_ensemble_epoch": 0,
                "best_ensemble_metric": -float("inf"), "history": [],
            }
            state = self.init_state()

        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
        print(f"Total parameter number is : {n_params / 1e6:.3f} million")

        result_rows = np.zeros((cfg.n_epochs, 10))
        # exposed for inspection/tests: every host must end up with
        # identical rows (ensemble columns are broadcast from rank 0)
        self.result_rows = result_rows
        result_path = os.path.join(self.exp_dir, "result.csv")
        if resume and os.path.exists(result_path):
            prev = np.atleast_2d(np.loadtxt(result_path, delimiter=","))
            result_rows[: prev.shape[0]] = prev[: cfg.n_epochs]

        start_time = time.time()
        # deterministic train stream: per-step keys are fold_in(rng, step)
        # in the train step, and step is restored from the checkpoint, so a
        # resumed run reproduces the original run's RNG draws exactly
        rng = jax.random.fold_in(self.rng, 1)
        for epoch in range(progress["epoch"] + 1, cfg.n_epochs + 1):
            epoch_begin = time.time()
            # epoch-keyed sampling: a resumed run replays the exact batch
            # sequence the uninterrupted run would have seen
            self.train_loader.set_epoch(epoch)
            meters = {
                k: AverageMeter()
                for k in ("per_sample_time", "per_sample_data_time",
                          "per_sample_dnn_time", "loss")
            }
            end_time = time.time()
            # gstep is tracked host-side: fetching int(state.step) or the
            # loss every iteration would force a device sync per step and
            # forfeit async dispatch (on the tunneled backend that is a
            # ~200 ms round trip per step). Losses stay on device and are
            # fetched once per epoch; the NaN-divergence check runs at
            # print steps, matching the reference (traintest.py:129-131).
            gstep = progress["global_step"]
            epoch_losses = []
            # Device-side divergence flag: OR-accumulates isnan(loss) every
            # step with zero host syncs (one tiny async op per step), then
            # rides the print-step fetch. This gives the reference's exact
            # loss_meter.avg-is-nan window semantics (traintest.py:125-131):
            # a NaN at ANY step aborts at the end of its print window, even
            # if the print step's own loss were finite.
            diverged = jnp.zeros((), jnp.bool_)
            # device placement runs `device_prefetch` batches ahead on a
            # background thread: batch k+1's host->device transfer rides
            # under batch k's compute, so the 'data' meter reads true
            # input-pipeline starvation (queue wait), not transfer time
            batches = prefetch_to_device(
                iter(self.train_loader),
                lambda b: make_global_batch(b, self.mesh),
                depth=getattr(cfg, "device_prefetch", 2),
            )
            for i, (host_batch, batch) in enumerate(batches):
                # all-padding batches (n_valid==0) are possible under
                # sequential multi-host sharding; keep the step (collective
                # lockstep) but don't divide the meters by zero
                bs = max(int(host_batch["n_valid"]), 1)
                data_t = time.time() - end_time
                dnn_start = time.time()
                self._profile_tick(gstep)
                state, metrics = self.train_step(state, batch, rng)
                epoch_losses.append(metrics["loss"])
                diverged = jnp.logical_or(
                    diverged, jnp.any(jnp.isnan(metrics["loss"]))
                )
                gstep += 1
                is_print = gstep % cfg.n_print_steps == 0 and gstep != 0
                if is_print:
                    # Sync BEFORE reading the clock: dispatch is async (on
                    # the tunneled backend execution is deferred until a
                    # host transfer), so this fetch flushes the whole print
                    # window's device backlog. Taking it inside the timed
                    # region charges that backlog to this step's dnn meter,
                    # and the AverageMeter amortizes it over the window —
                    # the meters then report true sustained device
                    # throughput, not host dispatch speed.
                    loss, step_diverged = (
                        float(v) for v in jax.device_get(
                            (metrics["loss"], diverged)
                        )
                    )
                now = time.time()
                meters["per_sample_data_time"].update(data_t / bs, bs)
                meters["per_sample_dnn_time"].update((now - dnn_start) / bs, bs)
                meters["per_sample_time"].update((now - end_time) / bs, bs)
                if is_print:
                    meters["loss"].update(loss, bs)
                    print(
                        f"Epoch: [{epoch}][{i}/{self.steps_per_epoch}]  "
                        f"per-sample total {meters['per_sample_time'].avg:.5f}  "
                        f"data {meters['per_sample_data_time'].avg:.5f}  "
                        f"dnn {meters['per_sample_dnn_time'].avg:.5f}  "
                        f"loss {loss:.4f}",
                        flush=True,
                    )
                    if step_diverged:
                        print("training diverged...")
                        self._profile_flush()  # finalize any open trace
                        return state
                end_time = time.time()
            self._profile_flush()
            if epoch_losses:  # one sync per epoch for the exact mean
                fetched = np.asarray(jax.device_get(epoch_losses))
                # epoch-end backstop: a NaN between the last print step and
                # epoch end must still abort before validate/checkpointing
                if np.isnan(fetched).any():
                    print("training diverged...")
                    return state
                meters["loss"].reset()
                meters["loss"].update(
                    float(np.mean(fetched)), len(epoch_losses)
                )

            # ---------------- validation + artifacts (traintest.py:136-200)
            stats, valid_loss = self.validate(state, self.val_loader, epoch)
            # CSV-backed running ensemble is computed only where the CSVs
            # are written (rank 0), then its scalars are broadcast so every
            # host's result rows carry the same numbers
            ensemble_stats = self.validate_ensemble(epoch) if is_primary() else None

            mAP = float(np.mean([s["AP"] for s in stats]))
            mAUC = float(np.nanmean([s["auc"] for s in stats]))
            acc = stats[0]["acc"]
            if ensemble_stats is not None:
                ens_mAP = float(np.mean([s["AP"] for s in ensemble_stats]))
                ens_mAUC = float(np.nanmean([s["auc"] for s in ensemble_stats]))
                ens_acc = ensemble_stats[0]["acc"]
            else:
                ens_mAP = ens_mAUC = ens_acc = 0.0
            # collective: all hosts participate (non-primary send zeros)
            ens_mAP, ens_mAUC, ens_acc = (
                float(v) for v in broadcast_floats([ens_mAP, ens_mAUC, ens_acc])
            )
            mid_p = float(np.mean(
                [s["precisions"][len(s["precisions"]) // 2] for s in stats]
            ))
            mid_r = float(np.mean(
                [s["recalls"][len(s["recalls"]) // 2] for s in stats]
            ))
            cur_lr = float(self.schedule(self._host_step(state)))

            main = mAP if cfg.metrics == "mAP" else acc
            ens_main = ens_mAP if cfg.metrics == "mAP" else ens_acc
            print(f"mAP: {mAP:.6f}" if cfg.metrics == "mAP" else f"acc: {acc:.6f}")
            print(f"AUC: {mAUC:.6f}")
            print(f"d_prime: {d_prime(mAUC):.6f}")
            print(f"train_loss: {meters['loss'].avg:.6f}")
            print(f"valid_loss: {valid_loss:.6f}")

            result_rows[epoch - 1] = [
                main, mAUC, mid_p, mid_r, d_prime(mAUC), meters["loss"].avg,
                valid_loss, ens_main, ens_mAUC, cur_lr,
            ]
            if is_primary():
                np.savetxt(result_path, result_rows, delimiter=",")
            self._tb_epoch(epoch, {
                "loss/train": meters["loss"].avg,
                "loss/valid": valid_loss,
                f"val/{cfg.metrics}": main,
                "val/AUC": mAUC,
                "val/d_prime": d_prime(mAUC),
                f"ensemble/{cfg.metrics}": ens_main,
                "lr": cur_lr,
                "time/per_sample_total": meters["per_sample_time"].avg,
                "time/per_sample_data": meters["per_sample_data_time"].avg,
                "time/per_sample_dnn": meters["per_sample_dnn_time"].avg,
            })

            if main > progress["best_metric"]:
                progress["best_metric"] = main
                progress["best_epoch"] = epoch
            if ens_main > progress["best_ensemble_metric"]:
                progress["best_ensemble_metric"] = ens_main
                progress["best_ensemble_epoch"] = epoch

            if progress["best_epoch"] == epoch:
                self.save_checkpoint(state, "best")
            self.save_checkpoint(state, f"epoch_{epoch}")

            if is_primary():
                with open(
                    os.path.join(self.exp_dir, f"stats_{epoch}.pickle"), "wb"
                ) as f:
                    pickle.dump(stats, f, protocol=pickle.HIGHEST_PROTOCOL)

            progress["epoch"] = epoch
            progress["global_step"] = self._host_step(state)
            progress["history"].append(
                [epoch, self._host_step(state), progress["best_epoch"],
                 progress["best_metric"], time.time() - start_time]
            )
            if is_primary():
                self._save_progress(progress)
            print(f"epoch {epoch} training time: {time.time() - epoch_begin:.3f}")

        if cfg.wa:
            self.weight_average(cfg.wa_start, cfg.wa_end)
        if self._tb is not None:
            self._tb.close()
        return state

    # ---------------------------------------------------------- validation

    def validate(
        self, state: TrainState, loader: AudioLoader, epoch, eval_target=False
    ):
        """No-grad eval pass; writes prediction CSVs (traintest.py:232-276).

        Loss is the mean of per-sample losses (the reference averages
        per-batch means; identical for equal batch sizes)."""
        preds, targets, losses = [], [], []
        batches = prefetch_to_device(
            iter(loader),
            lambda b: make_global_batch(b, self.mesh),
            depth=getattr(self.config, "device_prefetch", 2),
        )
        for host_batch, batch in batches:
            out, per_sample = self.eval_step(state, batch)
            out, tgt, per_sample = self._eval_batch_rows(
                host_batch, batch, out, per_sample
            )
            preds.append(out)
            targets.append(tgt)
            losses.append(per_sample)
        output = np.concatenate(preds)
        target = np.concatenate(targets)
        loss = float(np.mean(np.concatenate(losses)))
        stats = calculate_stats(output, target)

        if is_primary():
            pred_dir = os.path.join(self.exp_dir, "predictions")
            self._write_target_csv(pred_dir, "target.csv", target)
            np.savetxt(
                os.path.join(pred_dir, f"predictions_{epoch}.csv"),
                output,
                delimiter=",",
            )
            if eval_target:
                self._write_target_csv(pred_dir, "eval_target.csv", target)
        self._validate_barrier(epoch)
        return stats, loss

    def _write_target_csv(self, pred_dir: str, name: str, target):
        """Write a target matrix once per process: the FIRST write
        overwrites any file left by a previous run in the same exp_dir
        (stale targets would silently corrupt ensemble/protocol metrics),
        later calls keep it (the reference writes target.csv once,
        traintest.py:269-270)."""
        path = os.path.join(pred_dir, name)
        if name not in self._targets_refreshed or not os.path.exists(path):
            np.savetxt(path, target, delimiter=",")
            self._targets_refreshed.add(name)

    @staticmethod
    def _validate_barrier(epoch):
        """Multihost: make rank 0's prediction CSVs durable before any
        host proceeds (post_training_summary reads them right after)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"psla_validate_{epoch}")

    def _eval_batch_rows(self, host_batch, batch, out, per_sample,
                         seed_axis: bool = False):
        """One eval batch's (pred, target, loss) rows with padded tail
        rows dropped. Multihost, gathers the full eval shard set; each
        host's padded rows are dropped via a mask that travels the same
        global-array path as the outputs (so row order is consistent).
        With ``seed_axis`` the outputs carry a leading seed axis and the
        row mask applies to axis 1."""
        n_valid = int(host_batch["n_valid"])
        row = (slice(None),) if seed_axis else ()
        if jax.process_count() > 1:
            local_mask = np.zeros(len(host_batch["wav"]), bool)
            local_mask[:n_valid] = True
            data_sh = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data")
            )
            gmask = allgather_host(
                jax.make_array_from_process_local_data(data_sh, local_mask)
            )
            return (
                allgather_host(out)[row + (gmask,)],
                allgather_host(batch["labels"])[gmask],
                allgather_host(per_sample)[row + (gmask,)],
            )
        keep = row + (slice(None, n_valid),)
        return (
            np.asarray(out)[keep],
            host_batch["labels"][:n_valid],
            np.asarray(per_sample)[keep],
        )

    @staticmethod
    def _ensemble_folded_epoch(path) -> int:
        """Last epoch folded into the running-ensemble CSV (0 if none).

        Stored as a '# epoch=N' comment header inside the CSV itself
        (np.loadtxt skips comment lines) so the matrix and its fold state
        are updated in ONE atomic os.replace. Header-less files (written
        before this marker existed) report 0, i.e. the old always-fold
        behavior."""
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            first = f.readline()
        if first.startswith("#") and "epoch=" in first:
            return int(first.split("epoch=")[1])
        return 0

    def validate_ensemble(self, epoch: int):
        """Running mean of per-epoch prediction CSVs
        (traintest.py:278-294), deleting the epoch-1 file.

        Idempotent per epoch: a crash between this fold and the epoch's
        progress.json write (e.g. during the orbax saves) makes the
        resumed run REPLAY the epoch's validate; without the fold marker
        the replay would re-add the epoch's predictions at the wrong
        weight and silently corrupt every later ensemble metric."""
        pred_dir = os.path.join(self.exp_dir, "predictions")
        target = np.loadtxt(os.path.join(pred_dir, "target.csv"), delimiter=",")
        ens_path = os.path.join(pred_dir, "ensemble_predictions.csv")
        folded = self._ensemble_folded_epoch(ens_path)
        if folded >= epoch:  # replayed epoch: already folded in
            ensemble = np.loadtxt(ens_path, delimiter=",")
        elif epoch == 1:
            ensemble = np.loadtxt(
                os.path.join(pred_dir, "predictions_1.csv"), delimiter=","
            )
        else:
            ensemble = np.loadtxt(ens_path, delimiter=",") * (epoch - 1)
            ensemble += np.loadtxt(
                os.path.join(pred_dir, f"predictions_{epoch}.csv"), delimiter=","
            )
            prev = os.path.join(pred_dir, f"predictions_{epoch - 1}.csv")
            if os.path.exists(prev):
                os.remove(prev)
            ensemble = ensemble / epoch
        if folded < epoch:
            tmp = ens_path + ".tmp"
            np.savetxt(tmp, ensemble, delimiter=",", header=f"epoch={epoch}")
            os.replace(tmp, ens_path)
        return calculate_stats(np.atleast_2d(ensemble), np.atleast_2d(target))

    # ------------------------------------------------------ weight averaging

    def weight_average(self, start_epoch: int, end_epoch: int) -> TrainState:
        """Average params+batch_stats over epoch checkpoints
        (traintest.py:296-322 semantics, with the correct 1/N)."""
        cfg = self.config
        total = None
        count = 0
        to_delete = []
        for epoch in range(start_epoch, end_epoch + 1):
            path = self._ckpt_dir(f"epoch_{epoch}")
            if not os.path.exists(path):
                continue
            tree = self._ckpt.restore(path)
            part = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
            total = part if total is None else jax.tree.map(np.add, total, part)
            count += 1
            if not cfg.save_model:
                to_delete.append(path)
        if to_delete:
            # every host restores from these dirs at its own host-side
            # pace: barrier first, then rank 0 alone deletes
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("psla_wa_delete")
            if is_primary():
                for path in to_delete:
                    shutil.rmtree(path)
        if count == 0:
            raise FileNotFoundError(
                f"no checkpoints in epochs [{start_epoch}, {end_epoch}]"
            )
        avg = jax.tree.map(lambda x: x / count, total)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=avg["params"],
            batch_stats=avg["batch_stats"],
            opt_state=self.tx.init(avg["params"]),
        )
        # per-leaf placement: single-model states replicate; the ensemble
        # subclass shards seed-stacked leaves over 'ensemble' (a blanket
        # replicated put would be the transient ExE memory spike
        # restore_checkpoint's placement hook exists to avoid)
        state = jax.tree.map(
            lambda x: jax.device_put(x, self._state_placement(x)), state
        )
        self.save_checkpoint(state, "wa")
        stats, _ = self.validate(state, self.val_loader, "wa")
        mAP = float(np.mean([s["AP"] for s in stats]))
        mAUC = float(np.nanmean([s["auc"] for s in stats]))
        np.savetxt(os.path.join(self.exp_dir, "wa_result.csv"), [mAP, mAUC])
        print(f"weight-averaged model ({count} ckpts): mAP {mAP:.6f} AUC {mAUC:.6f}")
        return state
