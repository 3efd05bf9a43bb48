"""Ensemble-axis training: E independent seeds in one XLA program.

The PSLA protocol's headline number is an ensemble of independently trained
models (reference README: 10-model ensemble -> 0.474 mAP; the reference
trains them as separate jobs). TPU-native formulation: stack E seeds'
parameters along a leading axis sharded over an 'ensemble' mesh axis and
vmap the train step — each seed trains data-parallel over the 'data' axis
of its mesh slice, all seeds advance in lockstep in a single program. The
data stream is shared; per-seed rngs give independent init, mixup,
SpecAugment, and stochastic-depth draws.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from psla_tpu.train.state import TrainState
from psla_tpu.train.step import _BATCH_FIELDS, tpu_compiler_options


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
    state = jax.vmap(init_one)(keys)
    return jax.device_put(state, NamedSharding(mesh, P("ensemble")))


def build_ensemble_train_step(model, tx, pre_config, loss_type, mesh):
    """vmapped+sharded train step: state [E, ...], shared batch, rngs [E]."""
    from psla_tpu.train.step import make_train_step_fn

    core = make_train_step_fn(model, tx, pre_config, loss_type)
    vstep = jax.vmap(core, in_axes=(0, None, 0))

    ens = NamedSharding(mesh, P("ensemble"))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    batch_shardings = {k: data for k in _BATCH_FIELDS}
    batch_shardings["n_valid"] = repl
    return jax.jit(
        vstep,
        in_shardings=(ens, batch_shardings, ens),
        out_shardings=(ens, ens),
        donate_argnums=(0,),
        # same scoped-VMEM tuning as the single-model train step (+6%)
        compiler_options=tpu_compiler_options(),
    )


def build_ensemble_train_step_single_rng(
    model, tx, pre_config, loss_type, mesh, num_seeds: int
):
    """Like build_ensemble_train_step but takes ONE base rng and derives
    the per-seed streams inside the program (fold_in by seed index) — the
    Trainer-facing variant: the epoch loop keeps passing a single key and
    resume determinism is preserved (the per-seed key depends only on the
    base key and the seed index; the per-STEP key on state.step inside the
    core step). metrics['loss'] is the cross-seed mean (scalar: the loop's
    NaN check catches any diverged seed through the mean), with the
    per-seed vector under metrics['seed_loss']."""
    import jax.numpy as jnp

    from psla_tpu.train.step import make_train_step_fn

    core = make_train_step_fn(model, tx, pre_config, loss_type)
    vstep = jax.vmap(core, in_axes=(0, None, 0))

    def step(state, batch, rng):
        rngs = jax.vmap(lambda s: jax.random.fold_in(rng, s))(
            jnp.arange(num_seeds)
        )
        new_state, metrics = vstep(state, batch, rngs)
        return new_state, {
            "loss": jnp.mean(metrics["loss"]),
            "seed_loss": metrics["loss"],
        }

    ens = NamedSharding(mesh, P("ensemble"))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    batch_shardings = {k: data for k in _BATCH_FIELDS}
    batch_shardings["n_valid"] = repl
    return jax.jit(
        step,
        in_shardings=(ens, batch_shardings, repl),
        out_shardings=(ens, {"loss": repl, "seed_loss": repl}),
        donate_argnums=(0,),
        compiler_options=tpu_compiler_options(),
    )


def build_ensemble_eval_step(model, pre_config, loss_type, mesh):
    """vmapped+sharded eval step: (params [E,...], batch_stats [E,...],
    shared batch) -> (probs [E, B, C], per_sample_loss [E, B]).

    Takes the stacked params/batch_stats rather than a full TrainState:
    the weight-averaged state the Trainer also evaluates carries SCALAR
    step/opt-count leaves that cannot be vmapped along a seed axis.
    """
    from psla_tpu.train.step import make_eval_step_fn

    core = make_eval_step_fn(model, pre_config, loss_type)

    def eval_one(params, batch_stats, batch):
        state = TrainState(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params, batch_stats=batch_stats, opt_state=(),
        )
        return core(state, batch)

    vstep = jax.vmap(eval_one, in_axes=(0, 0, None))

    out = NamedSharding(mesh, P("ensemble", "data"))
    return jax.jit(
        vstep,
        out_shardings=(out, out),
        compiler_options=tpu_compiler_options(),
    )


def ensemble_member(state: TrainState, i: int) -> TrainState:
    """Extract one seed's state (for checkpointing / eval). Scalar leaves
    (e.g. the step/count of a freshly built weight-averaged state) are
    shared across seeds and pass through unchanged."""
    return jax.tree.map(
        lambda x: np.asarray(x)[i] if np.ndim(x) > 0 else np.asarray(x),
        state,
    )
