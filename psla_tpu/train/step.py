"""Jitted, mesh-sharded train/eval steps.

One XLA program does what the reference splits across CPU dataloader
workers and DataParallel GPU replicas (src/traintest.py:81-109): on-device
preprocessing (mixup -> fbank -> SpecAugment -> normalize), forward,
BCE/CE loss, backward, and the Adam update. Under a ('data',) mesh the
batch dims are sharded and XLA derives the gradient all-reduce over ICI
from the sharding annotations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from psla_tpu.frontend.pipeline import (
    PreprocessConfig,
    WavBatch,
    preprocess_eval,
    preprocess_train,
)
from psla_tpu.parallel.mesh import batch_sharding, replicated_sharding
from psla_tpu.train.optim import bce_loss, ce_loss
from psla_tpu.train.state import TrainState

_BATCH_FIELDS = (
    "wav", "wav_mean", "length", "labels",
    "mix_wav", "mix_wav_mean", "mix_length", "mix_labels",
)


def tpu_compiler_options() -> dict | None:
    """Per-compile XLA options for the hot step programs.

    Raising the scoped-VMEM budget to 48 MiB lets XLA pick larger fusion
    tiles for the memory-bound conv fusions: measured ~+6% train-step
    throughput on v5e (1007 -> 1068 clips/s; 24/32 MiB slightly lower,
    128 MiB regresses to baseline). TPU-only — other backends reject the
    flag."""
    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "49152"}


def _wav_batch(batch: dict) -> WavBatch:
    """Loader batch dict -> WavBatch, dequantizing int16 wire waveforms.

    Traced inside the jitted steps, so the x * 2^-15 dequantize fuses into
    the fbank's first consumer: the int16 wire format (data/loader.py
    quantize_pcm16) halves host->device bytes at zero extra HBM traffic,
    and the dequantized values are the bit-exact float32 samples for
    PCM16 sources (i * 2^-15 both ways)."""
    b = {k: batch[k] for k in _BATCH_FIELDS}
    for k in ("wav", "mix_wav"):
        if b[k].dtype == jnp.int16:
            b[k] = b[k].astype(jnp.float32) * jnp.float32(2.0 ** -15)
    return WavBatch(**b)


def with_mesh_context(fn, mesh):
    """Call (and therefore TRACE) ``fn`` under ``jax.sharding.set_mesh``.

    ``jax.jit(..., in_shardings=...)`` alone leaves the ambient abstract
    mesh EMPTY at trace time, so mesh-aware lowerings — the pallas fbank's
    nested shard_map wrap (fbank_pallas._ambient_auto_axes), which GSPMD
    cannot partition on its own — would silently not engage on multi-chip
    meshes. The context makes the mesh's Auto axes visible while tracing;
    it costs nothing per call once the jit cache is warm. Single-device
    meshes skip the context entirely: GSPMD places unpartitioned Mosaic
    kernels fine, and tracing under set_mesh measurably changes XLA's
    choices on the 1-chip hot path (~11% train throughput on v5e)."""
    if mesh.size == 1:
        return fn

    @functools.wraps(fn)
    def call(*args, **kwargs):
        with jax.sharding.set_mesh(mesh):
            return fn(*args, **kwargs)

    return call


def _tolerate_hostmeta(fn, batch_argnum: int):
    """Accept raw loader batches: 'n_valid' is host-side metadata that
    shard_batch/make_global_batch drop before the device, but a caller
    handing the jitted step a loader batch directly shouldn't hit an
    in_shardings pytree mismatch over an unused key."""
    from psla_tpu.parallel.mesh import drop_host_meta

    def strip(b):
        return drop_host_meta(b) if isinstance(b, dict) else b

    @functools.wraps(fn)
    def call(*args, **kwargs):
        if "batch" in kwargs:
            kwargs = dict(kwargs, batch=strip(kwargs["batch"]))
        elif len(args) > batch_argnum:
            args = (
                args[:batch_argnum]
                + (strip(args[batch_argnum]),)
                + args[batch_argnum + 1:]
            )
        # too-few-args calls fall through so jit reports its own
        # clear TypeError instead of an IndexError here
        return fn(*args, **kwargs)

    return call


def _per_sample_loss(probs, targets, loss_type):
    p = jnp.clip(probs, 1e-7, 1.0 - 1e-7)
    if loss_type == "BCE":
        return -jnp.mean(
            targets * jnp.log(p) + (1 - targets) * jnp.log1p(-p), axis=-1
        )
    idx = jnp.argmax(targets, axis=1)
    logp = p - jax.scipy.special.logsumexp(p, axis=-1, keepdims=True)
    return -jnp.take_along_axis(logp, idx[:, None], axis=1)[:, 0]


def make_train_step_fn(
    model,
    tx: optax.GradientTransformation,
    pre_config: PreprocessConfig,
    loss_type: str = "BCE",
):
    """The pure (un-jitted) train step — also unrolled per ensemble member
    inside parallel.ensemble's shard_map'd step."""
    loss_fn_final = bce_loss if loss_type == "BCE" else ce_loss

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        step_key = jax.random.fold_in(rng, state.step)
        pre_key, drop_key = jax.random.split(step_key)

        fbank, labels = preprocess_train(pre_key, _wav_batch(batch), pre_config)

        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                fbank,
                train=True,
                rngs={"dropout": drop_key},
                mutable=["batch_stats"],
            )
            return loss_fn_final(out, labels), mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = {"loss": loss}
        return new_state, metrics

    return train_step


def build_train_step(
    model,
    tx: optax.GradientTransformation,
    pre_config: PreprocessConfig,
    loss_type: str = "BCE",
    mesh=None,
):
    """Returns jitted train_step(state, batch, rng) -> (state, metrics)."""
    train_step = make_train_step_fn(model, tx, pre_config, loss_type)
    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        batch_shardings = {k: data for k in _BATCH_FIELDS}
        jitted = jax.jit(
            train_step,
            in_shardings=(repl, batch_shardings, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
            compiler_options=tpu_compiler_options(),
        )
        return _tolerate_hostmeta(with_mesh_context(jitted, mesh), 1)
    return jax.jit(
        train_step, donate_argnums=(0,), compiler_options=tpu_compiler_options()
    )


def make_eval_step_fn(
    model,
    pre_config: PreprocessConfig,
    loss_type: str = "BCE",
):
    """The pure (un-jitted) eval step — parallel.ensemble builds its own
    shard_map'd variant that shares one fbank across unrolled members."""
    eval_config = pre_config.eval_variant()

    def eval_step(state: TrainState, batch: dict):
        fbank = preprocess_eval(_wav_batch(batch), eval_config)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            fbank,
            train=False,
        )
        return out, _per_sample_loss(out, batch["labels"], loss_type)

    return eval_step


def build_eval_step(
    model,
    pre_config: PreprocessConfig,
    loss_type: str = "BCE",
    mesh=None,
):
    """Returns jitted eval_step(state, batch) -> (probs [B,C],
    per_sample_loss [B]). Host trims padded tail rows via batch['n_valid']."""
    eval_step = make_eval_step_fn(model, pre_config, loss_type)

    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        batch_shardings = {k: data for k in _BATCH_FIELDS}
        jitted = jax.jit(
            eval_step,
            in_shardings=(repl, batch_shardings),
            out_shardings=(data, data),
            compiler_options=tpu_compiler_options(),
        )
        return _tolerate_hostmeta(with_mesh_context(jitted, mesh), 1)
    return jax.jit(eval_step, compiler_options=tpu_compiler_options())
