"""Device mesh + sharding helpers: the distributed backend.

Replaces the reference's torch.nn.DataParallel (src/traintest.py:44-45;
single-process batch scatter over <=4 GPUs) with a jax.sharding Mesh:
batches are sharded over the 'data' axis, parameters/optimizer state are
replicated, and XLA inserts the gradient all-reduce (psum over ICI) from
the sharding annotations on the jitted train step — no explicit collective
code. Multi-host pods extend the same mesh over DCN via
jax.distributed.initialize (each host feeding its local shard; see
data/loader.py host sharding).

An optional second 'ensemble' axis trains E independent seeds
simultaneously (params stacked per-seed and sharded over the axis) — the
TPU-native formulation of the reference's multi-run ensembles (§2 of the
PSLA protocol trains 10 separate models; on a pod slice they can train in
one program).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int | None = None,
    ensemble: int = 1,
    devices=None,
    ensemble_axis: bool = False,
) -> Mesh:
    """1-D ('data',) mesh, or 2-D ('ensemble', 'data') when ensemble > 1.

    ``ensemble_axis=True`` forces the 2-D mesh even at ensemble == 1: the
    shard_map'd ensemble steps (parallel/ensemble.py) address the
    'ensemble' axis by name, so it must exist even when all members run
    unrolled inside a single shard (e.g. ensemble training on one chip).
    """
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            if num_devices > len(devices):
                raise ValueError(
                    f"requested num_devices={num_devices} but only "
                    f"{len(devices)} devices are visible"
                )
            devices = devices[:num_devices]
    devices = np.asarray(devices)
    if ensemble > 1 or ensemble_axis:
        assert devices.size % ensemble == 0
        grid = devices.reshape(ensemble, devices.size // ensemble)
        return Mesh(grid, ("ensemble", "data"))
    return Mesh(devices.reshape(-1), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data'; replicated over 'ensemble'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (seed) dim sharded over 'ensemble' (stacked params)."""
    return NamedSharding(mesh, P("ensemble"))


def drop_host_meta(batch: dict) -> dict:
    """Strip host-side metadata keys ('n_valid': the padded-row count,
    read only by the host loops) from a loader batch before it ships to
    the device. One source of truth for every boundary: shard_batch,
    make_global_batch, and the jitted steps' call wrappers — shipping
    n_valid as a "replicated" array would be a lie on multi-host eval,
    where the per-host values genuinely differ."""
    if "n_valid" in batch:
        return {k: v for k, v in batch.items() if k != "n_valid"}
    return batch


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (dict of numpy arrays) onto the mesh, batch-dim
    sharded over 'data'. Scalars are replicated; host metadata is dropped
    (drop_host_meta)."""
    batch = drop_host_meta(batch)
    data_size = mesh.shape["data"]
    rows = next(
        np.asarray(v).shape[0] for v in batch.values() if np.ndim(v) > 0
    )
    if rows % data_size:
        raise ValueError(
            f"batch size {rows} is not divisible by the {data_size}-device "
            f"'data' mesh axis; pick a batch size that is a multiple of the "
            f"device count"
        )
    data_sh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, repl)
        return jax.device_put(x, data_sh)

    return jax.tree.map(put, batch)
