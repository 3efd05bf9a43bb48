"""Subprocess worker for TRUE multi-process distributed tests.

Launched by tests/test_distributed.py with 2 processes x 2 virtual CPU
devices each (gloo collectives over localhost). Runs the framework's real
multi-host path — jax.distributed.initialize via maybe_initialize,
make_global_batch from host-local rows, the jitted mesh-sharded train
step, allgather_host for eval outputs — and dumps per-process results for
the parent to compare against a single-process ground-truth run.

Usage: python tests/distributed_worker.py PID NPROCS PORT OUTDIR
(env must set JAX_PLATFORMS=cpu and
 XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>)
"""

import json
import os
import sys

import numpy as np

GLOBAL_BATCH = 8  # divisible by the worker mesh (4) and conftest mesh (8)
N_CLASS = 8
TARGET_LENGTH = 64
STEPS = 2


def global_host_batch(pre):
    """The full deterministic GLOBAL_BATCH-row waveform batch (every
    process builds the same one and slices its local rows)."""
    rng = np.random.RandomState(0)
    b = GLOBAL_BATCH
    n = pre.fbank.buffer_length(TARGET_LENGTH)
    wav = (0.1 * rng.randn(b, n)).astype(np.float32)
    labels = np.eye(N_CLASS, dtype=np.float32)[rng.randint(N_CLASS, size=b)]
    return {
        "wav": wav,
        "wav_mean": wav.mean(axis=1),
        "length": np.full(b, n, np.int32),
        "labels": labels,
        "mix_wav": wav[::-1].copy(),
        "mix_wav_mean": wav.mean(axis=1)[::-1].copy(),
        "mix_length": np.full(b, n, np.int32),
        "mix_labels": labels[::-1].copy(),
        "n_valid": np.int32(b),
    }


def run(local_slice=None):
    """Build model+step exactly like __graft_entry__.dryrun_multichip's 1-D
    branch, feed `local_slice` rows of the global batch through
    make_global_batch, run STEPS train steps, and return
    (losses, param_l1, gathered_fbank_sum)."""
    import jax
    import jax.numpy as jnp

    from psla_tpu.config import ExperimentConfig
    from psla_tpu.models import create_model
    from psla_tpu.parallel.distributed import allgather_host, make_global_batch
    from psla_tpu.parallel.mesh import make_mesh
    from psla_tpu.train.optim import make_optimizer, psla_lr_schedule
    from psla_tpu.train.state import TrainState
    from psla_tpu.train.step import build_train_step, build_eval_step

    cfg = ExperimentConfig(
        impretrain=False,
        n_class=N_CLASS, eff_b=0, att_head=4, target_length=TARGET_LENGTH,
        freqm=8, timem=8, mixup=0.5, lr=1e-3, batch_size=GLOBAL_BATCH,
        warmup=True, bn_momentum=0.9,
    )
    pre = cfg.preprocess_config()
    model = create_model(
        cfg.model, label_dim=cfg.n_class, eff_b=cfg.eff_b,
        head_num=cfg.att_head, bn_momentum=cfg.bn_momentum,
    )
    tx = make_optimizer(psla_lr_schedule(cfg.lr, steps_per_epoch=100))
    mesh = make_mesh()  # all global devices

    full = global_host_batch(pre)
    host_batch = full
    if local_slice is not None:
        lo, hi = local_slice
        host_batch = {
            k: (v if np.ndim(v) == 0 else np.asarray(v)[lo:hi])
            for k, v in full.items()
        }

    example = jnp.zeros((1, TARGET_LENGTH, cfg.num_mel_bins), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    with mesh:
        state = jax.device_put(
            state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        step = build_train_step(model, tx, pre, cfg.loss, mesh=mesh)
        eval_step = build_eval_step(model, pre, cfg.loss, mesh=mesh)
        batch = make_global_batch(host_batch, mesh)
        losses = []
        for _ in range(STEPS):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
        probs, per_loss = eval_step(state, batch)
        gathered = allgather_host(probs)
    # accumulate on host in real float64 (jnp would silently stay f32
    # without jax_enable_x64)
    param_l1 = float(
        np.sum([
            np.float64(jnp.sum(jnp.abs(p)))
            for p in jax.tree.leaves(state.params)
        ])
    )
    assert gathered.shape == (GLOBAL_BATCH, N_CLASS), gathered.shape
    return losses, param_l1, float(np.sum(gathered))


def run_ensemble(num_seeds=2):
    """2-seed ensemble across ALL global devices: on the 2-proc harness
    the ('ensemble', 'data') mesh puts one seed's row on each process
    (ensemble_layout -> e_shards=2, full data stream per host), on the
    single-process ground truth both rows are local. Returns per-seed
    (losses, param_l1, prob_sums) — must agree between layouts."""
    import jax
    import jax.numpy as jnp

    from psla_tpu.config import ExperimentConfig
    from psla_tpu.parallel.distributed import (
        allgather_host, make_global_batch, process_info,
    )
    from psla_tpu.parallel.ensemble import (
        build_ensemble_eval_step,
        build_ensemble_train_step_single_rng,
        ensemble_layout,
        ensemble_member,
        init_ensemble_state,
    )
    from psla_tpu.parallel.mesh import make_mesh
    from psla_tpu.train.optim import make_optimizer, psla_lr_schedule

    cfg = ExperimentConfig(
        impretrain=False,
        n_class=N_CLASS, eff_b=0, att_head=4, target_length=TARGET_LENGTH,
        freqm=8, timem=8, mixup=0.5, lr=1e-3, batch_size=GLOBAL_BATCH,
        warmup=True, bn_momentum=0.9,
    )
    pre = cfg.preprocess_config()
    from psla_tpu.models import create_model

    model = create_model(
        cfg.model, label_dim=cfg.n_class, eff_b=cfg.eff_b,
        head_num=cfg.att_head, bn_momentum=cfg.bn_momentum,
    )
    tx = make_optimizer(psla_lr_schedule(cfg.lr, steps_per_epoch=100))

    host_id, num_hosts = process_info()
    e_shards, loader_id, loader_hosts = ensemble_layout(
        num_seeds, len(jax.devices()), host_id, num_hosts
    )
    mesh = make_mesh(ensemble=e_shards, ensemble_axis=True)

    # shared data stream: this harness's layout gives every host the full
    # batch (loader_hosts == 1); assert so silent layout drift is caught
    assert (loader_id, loader_hosts) == (0, 1), (loader_id, loader_hosts)
    host_batch = global_host_batch(pre)

    example = jnp.zeros((1, TARGET_LENGTH, cfg.num_mel_bins), jnp.float32)
    with mesh:
        state = init_ensemble_state(
            model, tx, list(range(num_seeds)), example, mesh
        )
        step = build_ensemble_train_step_single_rng(
            model, tx, pre, cfg.loss, mesh, num_seeds
        )
        eval_step = build_ensemble_eval_step(
            model, pre, cfg.loss, mesh, num_seeds
        )
        batch = make_global_batch(host_batch, mesh)
        seed_losses = []
        for _ in range(STEPS):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            seed_losses.append(
                np.asarray(allgather_host(metrics["seed_loss"])).tolist()
            )
        probs, _ = eval_step(state.params, state.batch_stats, batch)
        gathered = allgather_host(probs)
    assert gathered.shape == (num_seeds, GLOBAL_BATCH, N_CLASS), gathered.shape
    param_l1 = []
    for i in range(num_seeds):
        m = ensemble_member(state, i)  # exercises the multihost gather
        param_l1.append(float(
            np.sum([np.sum(np.abs(np.float64(p)))
                    for p in jax.tree.leaves(m.params)])
        ))
    prob_sums = [float(np.sum(gathered[i])) for i in range(num_seeds)]
    return seed_losses, param_l1, prob_sums


def run_trainer_ensemble(outdir):
    """EnsembleTrainer END-TO-END across processes — the advertised pod
    case where the 'ensemble' axis spans hosts. Covers the epoch-end
    host fetches on ensemble-sharded state (_host_step, save_checkpoint's
    collective gather), multihost validate + seed_result.csv, per-seed
    checkpoint extraction, weight averaging, and the post-training
    protocol (all via cli.run, exactly as a pod launch would)."""
    from psla_tpu import cli
    from psla_tpu.train import ensemble_loop

    # capture the trainer cli.run builds so this host's in-memory result
    # rows can be compared across processes (the ensemble columns are
    # rank-0-computed and broadcast — loop.py:broadcast_floats)
    captured = {}
    orig_train = ensemble_loop.EnsembleTrainer.train

    def train_capture(self, *a, **k):
        captured["trainer"] = self
        return orig_train(self, *a, **k)

    ensemble_loop.EnsembleTrainer.train = train_capture

    datafile = os.environ["PSLA_TEST_DATAFILE"]
    label_csv = os.environ["PSLA_TEST_LABELCSV"]
    exp_dir = os.environ["PSLA_TEST_EXPDIR"]
    summary = cli.run([
        "--data-train", datafile,
        "--data-val", datafile,
        "--data-eval", datafile,
        "--label-csv", label_csv,
        "--exp-dir", exp_dir,
        "--n_class", "3", "--eff_b", "0", "--att_head", "1",
        "--impretrain", "False",
        "--target_length", "64",
        "--freqm", "0", "--timem", "0", "--mixup", "0.0",
        "--lr", "2e-3", "--batch-size", "4", "--n-epochs", "1",
        "--warmup", "False",
        "--wa", "True", "--wa_start", "1", "--wa_end", "1",
        "--bal", "False", "--num-workers", "1",
        "--ensemble-seeds", "2",
    ])
    return {
        "summary": {k: {m: float(v) for m, v in part.items()}
                    for k, part in summary.items()},
        # this HOST's in-memory epoch rows (incl. broadcast ensemble cols)
        "result_rows": np.asarray(captured["trainer"].result_rows).tolist(),
    }


def run_trainer_plain(outdir):
    """PLAIN data-parallel Trainer END-TO-END across processes via cli.run
    — the pod story for the headline SINGLE-model run (SURVEY §5.8 /
    BASELINE config #5), as opposed to run_trainer_ensemble's 2-D mesh.
    Env: PSLA_TEST_EPOCHS, PSLA_TEST_RESUME=1 to continue a killed run
    (the parent drives kill -> resume and compares against an
    uninterrupted control)."""
    from psla_tpu import cli
    from psla_tpu.train import loop as train_loop

    captured = {}
    orig_train = train_loop.Trainer.train

    def train_capture(self, *a, **k):
        captured["trainer"] = self
        return orig_train(self, *a, **k)

    train_loop.Trainer.train = train_capture

    # PSLA_TEST_SIGKILL_EPOCH=N: die by REAL SIGKILL on entering epoch N's
    # validate — epoch N-1's artifacts are durable on disk, epoch N is in
    # flight with nothing written, i.e. the mid-run interruption a pod
    # resume must survive (no atexit, no finalizers, no clean exit)
    kill_epoch = int(os.environ.get("PSLA_TEST_SIGKILL_EPOCH", "0"))
    if kill_epoch:
        import signal

        orig_validate = train_loop.Trainer.validate

        def validate_kill(self, state, loader, epoch, *a, **k):
            if epoch >= kill_epoch:
                # Barrier BEFORE dying: without it the faster worker's
                # SIGKILL lands while the slower one is still inside the
                # epoch's last collective, which then fails with a gloo
                # peer error (exit 1) instead of the intended -9. The
                # barrier proves both workers have left every prior
                # collective; for 2 ranks each side completes it
                # independently of the peer's subsequent death.
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("pre_sigkill")
                os.kill(os.getpid(), signal.SIGKILL)
            return orig_validate(self, state, loader, epoch, *a, **k)

        train_loop.Trainer.validate = validate_kill

    epochs = os.environ["PSLA_TEST_EPOCHS"]
    args = [
        "--data-train", os.environ["PSLA_TEST_DATAFILE"],
        "--data-val", os.environ["PSLA_TEST_DATAFILE"],
        "--data-eval", os.environ["PSLA_TEST_DATAFILE"],
        "--label-csv", os.environ["PSLA_TEST_LABELCSV"],
        "--exp-dir", os.environ["PSLA_TEST_EXPDIR"],
        "--n_class", "3", "--eff_b", "0", "--att_head", "1",
        "--impretrain", "False",
        "--target_length", "64",
        # deterministic across launches (seeded per-step draws), with
        # SpecAugment exercising the augmented path; mixup off so the
        # killed/resumed/control legs are bit-comparable
        "--freqm", "4", "--timem", "4", "--mixup", "0.0",
        "--lr", "2e-3", "--batch-size", "4", "--n-epochs", epochs,
        "--warmup", "False",
        "--wa", os.environ.get("PSLA_TEST_WA", "False"),
        "--wa_start", "1", "--wa_end", epochs,
        "--bal", "False", "--num-workers", "1",
    ]
    if os.environ.get("PSLA_TEST_RESUME") == "1":
        args.append("--resume")
    summary = cli.run(args)
    trainer = captured["trainer"]
    state = trainer.restore_checkpoint(f"epoch_{epochs}")
    import jax

    param_l1 = float(
        np.sum([
            np.sum(np.abs(np.float64(np.asarray(p))))
            for p in jax.tree.leaves(state.params)
        ])
    )
    return {
        "summary": {k: {m: float(v) for m, v in part.items()}
                    for k, part in summary.items()},
        "result_rows": np.asarray(trainer.result_rows).tolist(),
        "param_l1": param_l1,
    }


def main():
    pid, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "plain"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from psla_tpu.parallel.distributed import (
        is_primary, maybe_initialize, process_info,
    )

    assert maybe_initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert process_info() == (pid, nprocs)
    assert is_primary() == (pid == 0)

    if mode == "ensemble":
        seed_losses, param_l1, prob_sums = run_ensemble()
        payload = {"seed_losses": seed_losses, "param_l1": param_l1,
                   "prob_sums": prob_sums}
    elif mode == "trainer_ensemble":
        payload = run_trainer_ensemble(outdir)
    elif mode == "trainer_plain":
        payload = run_trainer_plain(outdir)
    else:
        per_host = GLOBAL_BATCH // nprocs
        losses, param_l1, gathered_sum = run(
            local_slice=(pid * per_host, (pid + 1) * per_host)
        )
        payload = {"losses": losses, "param_l1": param_l1,
                   "gathered_sum": gathered_sum}
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(payload, f)
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main()
