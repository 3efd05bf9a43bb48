"""Ensemble-axis Trainer: E independent seeds in one XLA program.

The PSLA protocol's headline numbers come from ensembles of independently
trained models (reference README.md:206: 10 models -> 0.474 mAP; the
reference trains them as SEPARATE jobs and combines afterwards with
src/ensemble/ensemble.py). TPU-native formulation: parameters of E seeds
are stacked on a leading axis sharded over the 'ensemble' axis of a 2-D
('ensemble', 'data') mesh; one shard_map'd train step (local members
unrolled — see parallel/ensemble.py) advances all seeds in
lockstep, each seed data-parallel over its mesh slice. Per-seed RNG
streams (fold_in by seed index) give independent head init, mixup,
SpecAugment, dropout, and drop-connect draws; the data stream is shared.

Drive with ``--ensemble-seeds E`` (any E on any topology: the 'ensemble'
mesh axis takes the largest host-aligned common divisor of E and the
device count — parallel/ensemble.ensemble_layout — and the remaining
members unroll locally per shard; 10 seeds on 8 chips, 2 seeds on one
chip, and the axis spanning hosts of a pod all work. Multi-host, each
host's loader feeds its position within its ensemble row and eval
outputs are allgathered; verified by a true 2-process run,
tests/test_distributed.py). The full Trainer protocol applies per seed
and to the seed-mean:

  * the per-epoch ``predictions_{e}.csv`` holds the SEED-MEAN prediction
    matrix, so result.csv's ensemble columns and the running
    checkpoint-ensemble become a checkpoints x seeds ensemble;
  * per-seed matrices land in ``predictions_{e}_seed{i}.csv`` and
    per-seed/ensemble mAPs in ``seed_result.csv``;
  * stacked checkpoints (resume) are saved per epoch; per-seed extracted
    checkpoints for the 'best' and 'wa' tags land in
    ``models/{best,wa}_seed{i}`` and are consumable by
    ``psla_tpu.tools.ensemble`` like any single-model checkpoint;
  * ``--impretrain``/``--pretrained-ckpt`` load the (shared) backbone
    into every seed while pooling heads — and any leaf the converter
    takes fresh from the init, e.g. resnet/mbnet's 1-channel stem —
    stay per-seed independent, matching the reference protocol where
    every ensemble member is a separate job with its own torch init.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from psla_tpu.data.device_prefetch import prefetch_to_device
from psla_tpu.metrics import calculate_stats
from psla_tpu.parallel.distributed import (
    allgather_host,
    is_primary,
    make_global_batch,
)
from psla_tpu.parallel.ensemble import (
    build_ensemble_eval_step,
    build_ensemble_train_step_single_rng,
    ensemble_member,
    init_ensemble_state,
)
from psla_tpu.parallel.mesh import ensemble_sharding, make_mesh
from psla_tpu.train.loop import Trainer
from psla_tpu.train.state import TrainState

# pooling-head / classifier top-level param collections: per-seed fresh
# even when a pretrained backbone is loaded
_HEAD_KEYS = frozenset({"attention", "classifier"})


class EnsembleTrainer(Trainer):
    def __init__(self, config, train_loader, val_loader, eval_loader=None):
        if config.ensemble_seeds < 2:
            raise ValueError("EnsembleTrainer needs ensemble_seeds >= 2")
        self.num_seeds = config.ensemble_seeds
        self._seed_rows: dict[str, str] = {}  # seed_result.csv, keyed rows
        super().__init__(config, train_loader, val_loader, eval_loader)

    def _build_steps(self):
        """2-D ('ensemble', 'data') mesh + shard_map'd multi-seed steps
        (overrides the Trainer hook — built exactly once). The 'ensemble'
        axis takes the largest shard count compatible with the seed
        count, the device count, AND (multi-host) the host boundaries —
        ensemble_layout — and the remaining seeds-per-shard run
        unrolled inside each shard (parallel/ensemble.py), so ANY seed
        count works on ANY topology: 10 seeds on 8 chips (2-D (2,4)
        mesh, 5 local members), 2 seeds on one chip (both local), or
        2 seeds across a 2-host pod (one row per host; the CLI shards
        each host's loader by its position within its row)."""
        from psla_tpu.parallel.distributed import process_info
        from psla_tpu.parallel.ensemble import ensemble_layout

        config = self.config
        n_dev = config.num_devices or len(jax.devices())
        host_id, num_hosts = process_info()
        e_shards, row_host_id, row_num_hosts = ensemble_layout(
            self.num_seeds, n_dev, host_id, num_hosts
        )
        if num_hosts > 1:
            self._check_loader_shards(row_host_id, row_num_hosts)
        self.mesh = make_mesh(
            config.num_devices, ensemble=e_shards, ensemble_axis=True
        )
        self.train_step = build_ensemble_train_step_single_rng(
            self.model, self.tx, self.pre_config, config.loss, self.mesh,
            self.num_seeds,
        )
        self.eval_step = build_ensemble_eval_step(
            self.model, self.pre_config, config.loss, self.mesh,
            self.num_seeds,
        )

    def _check_loader_shards(self, row_host_id: int, row_num_hosts: int):
        """Multi-host guard: the ensemble mesh replicates the batch over
        the 'ensemble' axis, so hosts at the same position WITHIN their
        ensemble row must feed identical rows — each loader's data-stream
        shard must be its within-row position (cli.make_loaders remaps
        before building loaders). Hand-built loaders sharded by GLOBAL
        host id would silently feed divergent data to replicated
        positions; catch that here. Duck-typed: loaders without a
        LoaderConfig-style .config (test doubles) are skipped."""
        for name in ("train_loader", "val_loader", "eval_loader"):
            loader = getattr(self, name, None)
            lcfg = getattr(loader, "config", None)
            got = (getattr(lcfg, "host_id", None),
                   getattr(lcfg, "num_hosts", None))
            if None in got:
                continue
            if got != (row_host_id, row_num_hosts):
                raise ValueError(
                    f"EnsembleTrainer: {name} is sharded as host "
                    f"{got[0]}/{got[1]} but this host's position within "
                    f"its ensemble row is {row_host_id}/{row_num_hosts}; "
                    "build loaders with the ensemble_layout-remapped "
                    "(host_id, num_hosts) (cli.make_loaders does this)"
                )

    # ------------------------------------------------------------- state

    def init_state(self) -> TrainState:
        cfg = self.config
        example = jnp.zeros(
            (1, cfg.target_length, cfg.num_mel_bins), jnp.float32
        )
        seeds = [cfg.seed + i for i in range(self.num_seeds)]
        state = init_ensemble_state(
            self.model, self.tx, seeds, example, self.mesh
        )
        path = cfg.pretrained_ckpt
        if not path and cfg.impretrain:
            from psla_tpu.models.pretrained import resolve_imagenet_checkpoint

            path = resolve_imagenet_checkpoint(cfg.model, cfg.eff_b)
            print(f"loading ImageNet pretrained backbone: {path}")
        if path:
            state = self._overlay_pretrained(path, state)
        return state

    def _overlay_pretrained(self, path: str, state) -> TrainState:
        """Convert the pretrained source against EVERY seed's own init and
        overlay the results onto the stacked state.

        Per-seed conversion (not a broadcast of one converted tree) so that
        leaves the converter takes from the init — resnet/mbnet's fresh
        1-channel stem, any stem='random' path — stay independent per seed,
        matching the reference protocol where each ensemble member is a
        separate job with its own torch init. Head collections always stay
        per-seed fresh, even for full checkpoints."""
        E = self.num_seeds
        payload = self._read_pretrained(path)  # torch.load / restore ONCE

        # one host fetch of the stacked trees (a collective gather when
        # the ensemble axis spans hosts), then slice members from numpy
        def fetch(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return allgather_host(x)
            return np.asarray(x)

        host_params = jax.tree.map(fetch, dict(state.params))
        host_stats = jax.tree.map(fetch, dict(state.batch_stats))

        def member_vars(i):
            m = lambda t: jax.tree.map(lambda x: x[i], t)
            return {"params": m(host_params),
                    "batch_stats": m(host_stats)}

        per_seed = [
            self._convert_pretrained(payload, member_vars(i)) for i in range(E)
        ]

        def stack_key(trees):
            return jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *trees
            )

        new_params = dict(host_params)
        for k in per_seed[0]["params"]:
            if k not in _HEAD_KEYS:
                new_params[k] = stack_key([p["params"][k] for p in per_seed])
        new_stats = dict(host_stats)
        for k in per_seed[0].get("batch_stats", {}):
            if k not in _HEAD_KEYS:
                new_stats[k] = stack_key(
                    [p["batch_stats"][k] for p in per_seed]
                )
        # fresh optimizer state on the overlaid params (same shapes; Adam
        # moments are zeros either way, so re-init keeps it simple+correct)
        new_state = TrainState(
            step=np.zeros((E,), np.int32),
            params=new_params,
            batch_stats=new_stats,
            opt_state=jax.vmap(self.tx.init)(new_params),
        )
        return jax.device_put(new_state, ensemble_sharding(self.mesh))

    def _state_placement(self, x):
        # seed-stacked leaves shard over 'ensemble' straight from host;
        # scalar leaves (the step/opt-count of a weight-averaged
        # checkpoint) replicate
        if np.ndim(x) > 0:
            return ensemble_sharding(self.mesh)
        return jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()
        )

    def save_checkpoint(self, state: TrainState, tag):
        super().save_checkpoint(state, tag)  # stacked (resume / wa source)
        if str(tag) in ("best", "wa"):
            # per-seed extracts: plain single-model checkpoints, directly
            # consumable by tools/ensemble.py & tools/weight_averaging.py
            for i in range(self.num_seeds):
                Trainer.save_checkpoint(
                    self, ensemble_member(state, i), f"{tag}_seed{i}"
                )

    # ------------------------------------------------------- seed_result

    def _write_seed_result(self, key, member_maps, ens_map):
        """Rewrite seed_result.csv whole, like result.csv: one row per
        KEY (epoch number or protocol tag), deduplicated — a crash-window
        resume that replays an epoch's validate overwrites that epoch's
        row instead of appending a duplicate. Numeric-epoch rows come
        first (sorted), protocol tag rows ('best_single_valid_set', 'wa',
        'eval_*') after. Written atomically (tmp + rename) so a live
        `psla-watch` poll never sees a torn file."""
        self._seed_rows[str(key)] = (
            f"{key},"
            + ",".join(f"{m:.6f}" for m in member_maps)
            + f",{ens_map:.6f}"
        )
        keys = sorted(
            (k for k in self._seed_rows if k.isdigit()), key=int
        ) + [k for k in self._seed_rows if not k.isdigit()]
        path = os.path.join(self.exp_dir, "seed_result.csv")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("".join(self._seed_rows[k] + "\n" for k in keys))
        os.replace(tmp, path)

    def train(self, resume: bool = False) -> TrainState:
        if resume:
            # reload prior rows so the whole-file rewrite keeps them
            path = os.path.join(self.exp_dir, "seed_result.csv")
            if os.path.exists(path):
                for line in open(path):
                    if line.strip():
                        self._seed_rows[line.split(",", 1)[0]] = line.strip()
        return super().train(resume)

    # --------------------------------------------------------- validation

    def validate(self, state, loader, epoch, eval_target=False):
        """Per-seed eval + seed-mean ensemble in one pass.

        Returns (ensemble_stats, mean_loss) so every Trainer/protocol
        consumer sees the headline (seed-mean) metrics; per-seed stats are
        computed on rank 0 only (kept on ``self.last_member_stats``,
        written to seed_result.csv; None on other hosts).
        """
        preds, targets, losses = [], [], []
        batches = prefetch_to_device(
            iter(loader),
            lambda b: make_global_batch(b, self.mesh),
            depth=getattr(self.config, "device_prefetch", 2),
        )
        for host_batch, batch in batches:
            out, per_sample = self.eval_step(
                state.params, state.batch_stats, batch
            )
            # shared Trainer gather helper; outputs carry a leading seed
            # axis, so the padded-row mask applies to axis 1
            out, tgt, per_sample = self._eval_batch_rows(
                host_batch, batch, out, per_sample, seed_axis=True
            )
            preds.append(out)
            targets.append(tgt)
            losses.append(per_sample)
        output = np.concatenate(preds, axis=1)  # [E, N, C]
        target = np.concatenate(targets)
        loss = float(np.mean(np.concatenate(losses, axis=1)))

        # per-seed curve builds are E-fold host CPU and their results are
        # only written/printed on rank 0 — don't burn every pod host on
        # them; the seed-MEAN stats (consumed by all hosts) stay global
        member_stats = (
            [calculate_stats(output[i], target) for i in range(self.num_seeds)]
            if is_primary()
            else None
        )
        mean_pred = output.mean(axis=0)
        stats = calculate_stats(mean_pred, target)
        self.last_member_stats = member_stats

        if is_primary():
            pred_dir = os.path.join(self.exp_dir, "predictions")
            self._write_target_csv(pred_dir, "target.csv", target)
            np.savetxt(
                os.path.join(pred_dir, f"predictions_{epoch}.csv"),
                mean_pred, delimiter=",",
            )
            for i in range(self.num_seeds):
                np.savetxt(
                    os.path.join(pred_dir, f"predictions_{epoch}_seed{i}.csv"),
                    output[i], delimiter=",",
                )
                # bound disk use like the reference does for its per-epoch
                # CSVs (traintest.py:288): keep only the latest epoch's
                # per-seed matrices
                if isinstance(epoch, int) and epoch > 1:
                    prev = os.path.join(
                        pred_dir, f"predictions_{epoch - 1}_seed{i}.csv"
                    )
                    if os.path.exists(prev):
                        os.remove(prev)
            if eval_target:
                self._write_target_csv(pred_dir, "eval_target.csv", target)
            member_maps = [
                float(np.mean([s["AP"] for s in ms])) for ms in member_stats
            ]
            ens_map = float(np.mean([s["AP"] for s in stats]))
            self._write_seed_result(epoch, member_maps, ens_map)
            print(
                f"[{epoch}] seed mAPs: "
                + " ".join(f"{m:.4f}" for m in member_maps)
                + f" | seed-ensemble mAP: {ens_map:.4f}"
            )
        self._validate_barrier(epoch)
        return stats, loss
