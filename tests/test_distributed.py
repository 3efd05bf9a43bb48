"""Multi-host helpers (parallel/distributed.py), single-process semantics.

True multi-process behavior needs a pod launcher; here the contract is that
every helper degrades to the plain single-host path (the same guarantee
that makes one program serve both cases), plus loader host-sharding math.
"""

import numpy as np
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
    # scalar replicated
    assert np.asarray(out["n_valid"]) == 16


def test_allgather_host_identity_single_process():
    mesh = make_mesh(8)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    x = jax.device_put(jnp.arange(16.0).reshape(16, 1), sh)
    got = distributed.allgather_host(x)
    np.testing.assert_array_equal(got, np.arange(16.0).reshape(16, 1))
