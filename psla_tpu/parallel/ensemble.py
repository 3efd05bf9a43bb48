"""Ensemble-axis training: E independent seeds in one XLA program.

The PSLA protocol's headline number is an ensemble of independently trained
models (reference README: 10-model ensemble -> 0.474 mAP; the reference
trains them as separate jobs). TPU-native formulation: stack E seeds'
parameters along a leading axis sharded over an 'ensemble' mesh axis and
shard_map the train step over that axis — each seed trains data-parallel
over the 'data' axis of its mesh slice, all seeds advance in lockstep in a
single program. The data stream is shared; per-seed rngs give independent
init, mixup, SpecAugment, and stochastic-depth draws.

Why shard_map + an unrolled local-member loop, NOT vmap over the stacked
axis (the formulation used through round 2):

1. CORRECTNESS: vmapping model.apply over stacked conv kernels batches
   convolutions with BOTH operands mapped, which jax lowers by folding the
   member axis into the channel dims with feature_group_count *= E. When
   that folded axis is then sharded by GSPMD, XLA (jax 0.9.0) partitions
   the grouped convolution WRONG: a 5-line repro (vmap of a 1x1
   conv_general_dilated with batched lhs+rhs, inputs sharded over the
   mapped axis on 2 devices) returns maxdiff ~2.0 on O(1) data, while the
   identical einsum is exact. Through the full EffNet the corruption
   reached 0.10 absolute in output probabilities. shard_map makes the
   member axis manual, so each shard runs its members as ordinary
   unbatched convs — exact by construction (goldens: the sharded step now
   matches the per-member unsharded forward bit-for-bit... see
   tests/test_parallel.py, tests/test_tools.py).
2. SPEED: even where it is numerically right (ensemble axis unsharded),
   the batched-kernel conv formulation maps poorly onto the MXU —
   measured on v5e at E=4/B=128 eval: 761 ensemble-clips/s vmapped vs
   1,452 unrolled plain convs (true sequential passes: ~1,269).

The 'data' axis stays under compiler control (partial-manual shard_map,
``axis_names={'ensemble'}``): inside the body the per-member train step is
the SAME code as single-model training, and XLA derives the data-parallel
gradient reduction from the batch/param shardings exactly as in
train/step.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from psla_tpu.parallel.distributed import allgather_host
from psla_tpu.train.state import TrainState
from psla_tpu.train.step import tpu_compiler_options


def ensemble_layout(
    num_seeds: int, n_devices: int, host_id: int = 0, num_hosts: int = 1
) -> tuple[int, int, int]:
    """Choose the 'ensemble' mesh-axis shard count and the host's data
    stream shard for an E-seed ensemble on n_devices across num_hosts.

    Returns ``(e_shards, loader_host_id, loader_num_hosts)``:

    * ``e_shards`` — the ensemble axis size: the largest common divisor
      of (num_seeds, n_devices) whose rows also align with host
      boundaries (whole host groups per row, or whole rows per host);
      the remaining seeds-per-shard unroll locally
      (build_ensemble_*_step). e_shards=1 always qualifies, so ANY seed
      count works on ANY topology.
    * ``(loader_host_id, loader_num_hosts)`` — the shard of the shared
      data stream this host must feed. The batch is replicated over
      'ensemble' and sharded over 'data', so a host's shard is its
      position WITHIN its ensemble row (hosts at the same position in
      different rows feed identical rows — loader seeding keys off this
      position, keeping replication consistent); a host holding whole
      rows feeds the full stream.

    Assumes the standard multi-controller layout: jax.devices() ordered
    by process with equal, contiguous per-host device blocks (true for
    jax.distributed TPU pods and the gloo CPU test harness).
    """
    import math

    e = math.gcd(num_seeds, n_devices)
    while num_hosts % e and e % num_hosts:
        e -= 1
        while num_seeds % e or n_devices % e:
            e -= 1
    if num_hosts > e:
        hosts_per_row = num_hosts // e
        return e, host_id % hosts_per_row, hosts_per_row
    return e, 0, 1


def init_ensemble_state(model, tx, seeds, example, mesh) -> TrainState:
    """Initialize E stacked TrainStates, sharded over the 'ensemble' axis."""

    def init_one(key):
        variables = model.init(key, example, train=False)
        params = variables["params"]
        return TrainState(
            step=np.zeros((), np.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    keys = jax.random.split(jax.random.PRNGKey(0), len(seeds))
    keys = jax.vmap(lambda k, s: jax.random.fold_in(k, s))(
        keys, jax.numpy.asarray(seeds)
    )
    # jit the vmapped init: eager dispatch of the stacked flax init is
    # ~30 s on a 1-core CPU-mesh host; one compiled program is ~2 s
    state = jax.jit(jax.vmap(init_one))(keys)
    return jax.device_put(state, NamedSharding(mesh, P("ensemble")))


def _member(tree, m: int):
    """Slice one local member off every (stacked) leaf."""
    return jax.tree.map(lambda x: x[m], tree)


def _stack(trees):
    """Restack per-member result trees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _local_members(mesh, num_seeds: int) -> int:
    e_sh = mesh.shape["ensemble"]
    if num_seeds % e_sh:
        raise ValueError(
            f"num_seeds={num_seeds} must be divisible by the "
            f"{e_sh}-shard 'ensemble' mesh axis"
        )
    return num_seeds // e_sh


def build_ensemble_train_step(model, tx, pre_config, loss_type, mesh,
                              num_seeds: int):
    """shard_map'd train step: state [E, ...], shared batch, rngs [E].

    Each ensemble shard unrolls its E/shards local members through the
    ordinary single-model train step (see module docstring for why this
    is not a vmap). Metrics come back with a leading seed axis.
    """
    from psla_tpu.train.step import make_train_step_fn

    core = make_train_step_fn(model, tx, pre_config, loss_type)
    e_local = _local_members(mesh, num_seeds)

    @partial(
        jax.shard_map, mesh=mesh, axis_names=frozenset({"ensemble"}),
        in_specs=(P("ensemble"), P(), P("ensemble")),
        out_specs=(P("ensemble"), P("ensemble")),
    )
    def step(state, batch, rngs):
        results = [
            core(_member(state, m), batch, rngs[m]) for m in range(e_local)
        ]
        return _stack([r[0] for r in results]), _stack([r[1] for r in results])

    return jax.jit(
        step,
        donate_argnums=(0,),
        # same scoped-VMEM tuning as the single-model train step (+6%)
        compiler_options=tpu_compiler_options(),
    )


def build_ensemble_train_step_single_rng(
    model, tx, pre_config, loss_type, mesh, num_seeds: int
):
    """Like build_ensemble_train_step but takes ONE base rng and derives
    the per-seed streams inside the program (fold_in by GLOBAL seed index:
    shard_index * local_members + m — identical keys to the previous
    vmapped formulation, so resume stays deterministic; the per-STEP key
    depends on state.step inside the core step). metrics['loss'] is the
    cross-seed mean (scalar: the loop's NaN check catches any diverged
    seed through the mean), with the per-seed vector under
    metrics['seed_loss']."""
    from psla_tpu.train.step import make_train_step_fn

    core = make_train_step_fn(model, tx, pre_config, loss_type)
    e_local = _local_members(mesh, num_seeds)

    @partial(
        jax.shard_map, mesh=mesh, axis_names=frozenset({"ensemble"}),
        in_specs=(P("ensemble"), P(), P()),
        out_specs=(P("ensemble"), {"loss": P(), "seed_loss": P("ensemble")}),
    )
    def step(state, batch, rng):
        shard = jax.lax.axis_index("ensemble")
        new_states, losses = [], []
        for m in range(e_local):
            r = jax.random.fold_in(rng, shard * e_local + m)
            ns, mt = core(_member(state, m), batch, r)
            new_states.append(ns)
            losses.append(mt["loss"])
        seed_loss = jnp.stack(losses)
        loss = jax.lax.pmean(jnp.mean(seed_loss), "ensemble")
        return _stack(new_states), {"loss": loss, "seed_loss": seed_loss}

    return jax.jit(
        step,
        donate_argnums=(0,),
        compiler_options=tpu_compiler_options(),
    )


def build_ensemble_eval_step(model, pre_config, loss_type, mesh,
                             num_members: int):
    """shard_map'd eval step: (params [E,...], batch_stats [E,...],
    shared batch) -> (probs [E, B, C], per_sample_loss [E, B]).

    The shared preprocessing (fbank) is computed once per shard and each
    local member's forward is emitted as ordinary plain-conv XLA — both
    the correctness and the serving-throughput rationale are in the
    module docstring. Takes the stacked params/batch_stats rather than a
    full TrainState: the weight-averaged state the Trainer also evaluates
    carries SCALAR step/opt-count leaves that cannot be stacked along a
    seed axis.
    """
    from psla_tpu.frontend.pipeline import preprocess_eval
    from psla_tpu.train.step import _per_sample_loss, _wav_batch

    eval_config = pre_config.eval_variant()
    e_local = _local_members(mesh, num_members)

    @partial(
        jax.shard_map, mesh=mesh, axis_names=frozenset({"ensemble"}),
        in_specs=(P("ensemble"), P("ensemble"), P()),
        out_specs=(P("ensemble"), P("ensemble")),
    )
    def step(params, batch_stats, batch):
        fbank = preprocess_eval(_wav_batch(batch), eval_config)
        outs, losses = [], []
        for m in range(e_local):
            out = model.apply(
                {"params": _member(params, m),
                 "batch_stats": _member(batch_stats, m)},
                fbank, train=False,
            )
            outs.append(out)
            losses.append(_per_sample_loss(out, batch["labels"], loss_type))
        return jnp.stack(outs), jnp.stack(losses)

    return jax.jit(step, compiler_options=tpu_compiler_options())


def ensemble_member(state: TrainState, i: int) -> TrainState:
    """Extract one seed's state (for checkpointing / eval). Scalar leaves
    (e.g. the step/count of a freshly built weight-averaged state) are
    shared across seeds and pass through unchanged. Multi-host: leaves
    sharded over an ensemble axis spanning hosts are gathered first
    (collective — every host must call this in the same order)."""

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = allgather_host(x)
        x = np.asarray(x)
        return x[i] if np.ndim(x) > 0 else x

    return jax.tree.map(fetch, state)
