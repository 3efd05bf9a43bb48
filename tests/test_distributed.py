"""Multi-host helpers (parallel/distributed.py).

Two layers: (a) single-process semantics — every helper degrades to the
plain single-host path (the guarantee that makes one program serve both
cases); (b) a TRUE two-process run (gloo collectives over localhost, 2x2
virtual CPU devices) driving jax.distributed init, make_global_batch,
the mesh-sharded train step, and allgather_host — checked for exact
agreement between the processes and numerical agreement with a
single-process run on the same global batch.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from psla_tpu.parallel import distributed
from psla_tpu.parallel.mesh import make_mesh


def test_maybe_initialize_noop_without_optin(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("PSLA_TPU_MULTIHOST", raising=False)
    assert distributed.maybe_initialize() is False
    assert jax.process_count() == 1


def test_process_info_single():
    assert distributed.process_info() == (0, 1)
    assert distributed.is_primary()


def test_make_global_batch_matches_shard_batch():
    mesh = make_mesh(8)
    batch = {
        "wav": np.random.randn(16, 32).astype(np.float32),
        "labels": np.random.rand(16, 3).astype(np.float32),
        "n_valid": np.int32(16),
    }
    out = distributed.make_global_batch(batch, mesh)
    assert out["wav"].shape == (16, 32)
    # batch dim sharded over the 8 'data' devices
    assert len(out["wav"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out["wav"]), batch["wav"])
    # n_valid is host-side metadata: per-host values differ on padded
    # eval batches, so it must never ship as a "replicated" device array
    assert "n_valid" not in out


def test_allgather_host_identity_single_process():
    mesh = make_mesh(8)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    x = jax.device_put(jnp.arange(16.0).reshape(16, 1), sh)
    got = distributed.allgather_host(x)
    np.testing.assert_array_equal(got, np.arange(16.0).reshape(16, 1))


def _spawn_two_process(tmp_path, mode="plain", extra_env=None):
    """Spawn 2 real processes (2 virtual CPU devices each) through the
    framework's multi-host path; return the live Popen handles."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.pathsep.join(
            [repo_root] + os.environ.get("PYTHONPATH", "").split(os.pathsep)
        ).rstrip(os.pathsep),
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.update(extra_env or {})
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    # grab a free port (closing the probe socket right before launch keeps
    # the race window tiny and avoids collisions between pytest sessions)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    return [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port),
             str(tmp_path), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=repo_root,
        )
        for pid in range(2)
    ]


def _launch_two_process(tmp_path, mode="plain", extra_env=None):
    """Launch 2 real processes to completion; return parsed payloads."""
    procs = _spawn_two_process(tmp_path, mode, extra_env)
    try:
        outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    return (
        json.load(open(tmp_path / "proc0.json")),
        json.load(open(tmp_path / "proc1.json")),
    )


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    """2 real processes vs a single-process run on the same 8-row global
    batch."""
    r0, r1 = _launch_two_process(tmp_path, "plain")
    # the global program is identical on both hosts: losses/params agree
    # exactly, and every host gathered the full eval output
    assert r0 == r1

    # single-process ground truth over the SAME global batch (the
    # conftest 8-device mesh vs the workers' 2x2 — only the reduction
    # sharding differs)
    from tests import distributed_worker as dw

    losses, param_l1, gathered_sum = dw.run(local_slice=None)
    np.testing.assert_allclose(r0["losses"], losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(r0["param_l1"], param_l1, rtol=2e-4)
    np.testing.assert_allclose(r0["gathered_sum"], gathered_sum, rtol=2e-3)


@pytest.mark.slow
def test_two_process_ensemble_matches_single_process(tmp_path):
    """A 2-seed ensemble with the 'ensemble' mesh axis spanning 2 REAL
    processes (one seed row per host, shared data stream) must train each
    seed exactly like the same ensemble run single-process."""
    r0, r1 = _launch_two_process(tmp_path, "ensemble")
    # the global program is identical on both hosts
    assert r0 == r1
    assert len(r0["param_l1"]) == 2
    # seeds are genuinely distinct models
    assert abs(r0["param_l1"][0] - r0["param_l1"][1]) > 1e-6

    from tests import distributed_worker as dw

    seed_losses, param_l1, prob_sums = dw.run_ensemble()
    np.testing.assert_allclose(
        r0["seed_losses"], seed_losses, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(r0["param_l1"], param_l1, rtol=2e-4)
    np.testing.assert_allclose(r0["prob_sums"], prob_sums, rtol=2e-3)


@pytest.mark.slow
def test_two_process_ensemble_trainer_end_to_end(tmp_path):
    """EnsembleTrainer (via cli.run) across 2 REAL processes with the
    'ensemble' axis spanning them — the advertised pod deployment. Covers
    the epoch-end host fetches on ensemble-sharded state (_host_step and
    save_checkpoint's collective gather), multihost validate + per-seed
    artifacts, weight averaging, and the post-training protocol."""
    from tests.synth import build_corpus

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    datafile, label_csv = build_corpus(
        str(corpus), num_classes=3, clips_per_class=4, seconds=0.5,
        multi_label_frac=0.0,
    )
    exp_dir = tmp_path / "exp"
    r0, r1 = _launch_two_process(
        tmp_path, "trainer_ensemble",
        extra_env={
            "PSLA_TEST_DATAFILE": datafile,
            "PSLA_TEST_LABELCSV": label_csv,
            "PSLA_TEST_EXPDIR": str(exp_dir),
        },
    )
    # the protocol summary is computed from globally gathered outputs and
    # shared CSVs: identical on both hosts, and finite
    assert r0 == r1
    for part in r0["summary"].values():
        assert np.isfinite(part["eval_mAP"])
    # every host carries IDENTICAL result rows — in particular the
    # rank-0-computed ensemble columns reached the non-primary host via
    # the epoch-end broadcast (they'd be 0.0 there otherwise)
    rows0 = np.asarray(r0["result_rows"])
    np.testing.assert_array_equal(rows0, np.asarray(r1["result_rows"]))
    assert rows0[0, 7] > 0.0  # ensemble main metric, epoch 1
    # rank-0 artifacts: stacked + per-seed checkpoints, seed_result.csv
    for tag in ("epoch_1", "best", "wa", "best_seed0", "best_seed1",
                "wa_seed0", "wa_seed1"):
        assert (exp_dir / "models" / tag).is_dir(), tag
    assert (exp_dir / "seed_result.csv").exists()
    rows = np.atleast_2d(np.loadtxt(
        exp_dir / "seed_result.csv", delimiter=",", dtype=str
    ))
    epoch1 = [r for r in rows if r[0] == "1"][0]
    assert len(epoch1) == 4  # key, 2 member mAPs, ensemble mAP
    # the stacked checkpoint carries BOTH seeds (the gather actually ran)
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(str(exp_dir / "models" / "best"))
    k = np.asarray(tree["params"]["effnet"]["stem"]["conv"]["kernel"])
    assert k.ndim == 5 and k.shape[0] == 2  # [E, H, W, I, O]
    assert np.abs(k[0] - k[1]).max() > 1e-6  # distinct seeds, both real


@pytest.mark.slow
def test_two_process_plain_trainer_kill_resume(tmp_path):
    """PLAIN data-parallel cli.run across 2 REAL processes — the pod
    story for the headline SINGLE-model flagship run (SURVEY §5.8 /
    BASELINE config #5), including a REAL mid-run kill + resume: both
    workers die by SIGKILL entering epoch 2 (epoch-1 artifacts durable,
    epoch 2 in flight, no clean shutdown), and the 2-process resume must
    reproduce an uninterrupted 2-epoch control exactly — result rows AND
    final parameters — with both hosts agreeing on everything."""
    from tests.synth import build_corpus

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    datafile, label_csv = build_corpus(
        str(corpus), num_classes=3, clips_per_class=4, seconds=0.5,
        multi_label_frac=0.0,
    )
    base_env = {
        "PSLA_TEST_DATAFILE": datafile,
        "PSLA_TEST_LABELCSV": label_csv,
        # one persistent XLA cache across all three legs: the kill and
        # resume legs recompile nothing (same program, same shapes),
        # which keeps this three-launch test inside the suite budget
        "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "xla_cache"),
    }

    # uninterrupted 2-epoch control
    exp_ctl = tmp_path / "exp_control"
    c0, c1 = _launch_two_process(
        tmp_path, "trainer_plain",
        extra_env={**base_env, "PSLA_TEST_EXPDIR": str(exp_ctl),
                   "PSLA_TEST_EPOCHS": "2", "PSLA_TEST_WA": "True"},
    )
    assert c0 == c1  # plain-DP path: both hosts see identical results
    for part in c0["summary"].values():
        assert np.isfinite(part["eval_mAP"])

    # SIGKILLed-mid-epoch-2 leg: both workers kill -9 themselves on
    # entering epoch 2's validate — epoch 1 is durable on disk, epoch 2
    # is in flight with no artifacts, no atexit/finalizers ran
    exp_kr = tmp_path / "exp_killresume"
    procs = _spawn_two_process(
        tmp_path, "trainer_plain",
        extra_env={**base_env, "PSLA_TEST_EXPDIR": str(exp_kr),
                   "PSLA_TEST_EPOCHS": "2",
                   "PSLA_TEST_SIGKILL_EPOCH": "2"},
    )
    try:
        for p in procs:
            p.communicate(timeout=1200)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p in procs:
        assert p.returncode == -9, p.returncode  # died by SIGKILL
    # torn-state contract: last finished epoch durable, nothing newer
    assert (exp_kr / "models" / "epoch_1").is_dir()
    assert not (exp_kr / "models" / "epoch_2").exists()

    # 2-process resume from the torn state to epoch 2
    r0, r1 = _launch_two_process(
        tmp_path, "trainer_plain",
        extra_env={**base_env, "PSLA_TEST_EXPDIR": str(exp_kr),
                   "PSLA_TEST_EPOCHS": "2", "PSLA_TEST_WA": "True",
                   "PSLA_TEST_RESUME": "1"},
    )
    assert r0 == r1

    # bit-exact resume ACROSS PROCESSES: the killed+resumed pod run
    # reproduces the uninterrupted control's trajectory and final params
    np.testing.assert_array_equal(
        np.asarray(r0["result_rows"]), np.asarray(c0["result_rows"])
    )
    assert r0["param_l1"] == c0["param_l1"]
    assert r0["summary"] == c0["summary"]

    # the artifact layout of the headline run is complete on rank 0
    rows = np.loadtxt(exp_kr / "result.csv", delimiter=",")
    assert rows.shape == (2, 10)
    for tag in ("epoch_1", "epoch_2", "best", "wa"):
        assert (exp_kr / "models" / tag).is_dir(), tag
