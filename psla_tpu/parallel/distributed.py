"""Multi-host (pod-slice) support: initialization + host-boundary helpers.

The reference has NO multi-node path at all — its only parallelism is
single-process DataParallel over <=4 GPUs (src/traintest.py:44-45).
Here a pod slice is the same program as a single chip:

  * ``maybe_initialize()`` brings up jax.distributed (coordinator discovery
    is automatic on TPU pods; explicit env vars work elsewhere), once.
  * ``make_global_batch(batch, mesh)`` assembles a global data-sharded
    array from each host's LOCAL loader shard (data/loader.py draws
    per-host samples via (host_id, num_hosts)), so the train step's batch
    is batch_size * num_hosts global rows without any host ever
    materializing another host's data.
  * ``allgather_host(x)`` gathers data-sharded eval outputs to every host
    so metric computation and prediction-CSV writing (train/loop.py
    validate) see the full eval set; rank 0 writes artifacts.

Collectives ride ICI inside a slice and DCN across slices — both derived
by XLA from the mesh; nothing here issues explicit communication beyond
the eval gather.
"""

from __future__ import annotations

import jax
import numpy as np


_INITIALIZED = False


def maybe_initialize(**kwargs) -> bool:
    """Initialize jax.distributed if a multi-process launch is requested.

    Opt-in triggers (safe to call unconditionally — single-process runs
    no-op): an explicit ``coordinator_address`` kwarg, the standard
    ``JAX_COORDINATOR_ADDRESS`` env var, or ``PSLA_TPU_MULTIHOST=1``
    (pod launchers where jax.distributed self-discovers). Returns True if
    the distributed runtime is (now) initialized.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    import os

    requested = (
        kwargs.get("coordinator_address")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("PSLA_TPU_MULTIHOST")
    )
    if not requested:
        return False
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def process_info() -> tuple[int, int]:
    """(host_id, num_hosts) for sharding the input pipeline."""
    return jax.process_index(), jax.process_count()


def make_global_batch(batch: dict, mesh) -> dict:
    """Host-local numpy batch -> global jax.Arrays sharded over 'data'.

    Single-process: plain device_put (identical to parallel.mesh.
    shard_batch). Multi-process: each host contributes its local rows via
    make_array_from_process_local_data; the global batch dim is
    local_rows * num_hosts. 'n_valid' stays host-side (see
    mesh.shard_batch) — its per-host values differ on padded eval
    batches, so it must never pose as a replicated global array.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        from psla_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, mesh)

    from psla_tpu.parallel.mesh import drop_host_meta

    batch = drop_host_meta(batch)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.make_array_from_process_local_data(repl, x)
        return jax.make_array_from_process_local_data(data_sh, x)

    return jax.tree.map(put, batch)


def allgather_host(x) -> np.ndarray:
    """Data-sharded device array -> full numpy array on every host."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def broadcast_floats(values) -> np.ndarray:
    """Replicate a small float vector from the primary host to all hosts.

    COLLECTIVE in multiprocess runs: every host must call it with a
    same-shaped array (non-primary inputs are ignored). Single-process:
    identity. Used to keep rank-0-computed epoch stats (the CSV-backed
    ensemble columns) identical in every host's result rows."""
    values = np.asarray(values, np.float32)
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(values))


def is_primary() -> bool:
    return jax.process_index() == 0
