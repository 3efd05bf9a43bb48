"""Arbitrary-length audio inference via chunked, pooling-exact aggregation.

The reference README advertises one-click inference on "audios of arbitrary
length (hours)" but ships no code for it (README.md:29, 267-268: the section
is TBD). This module implements it the TPU way:

  waveform (any length)
    -> fixed-size chunk grid (target_length-frame windows, static shapes)
    -> batched on-device preprocessing (DC removal -> fbank -> normalize,
       the eval path of frontend/pipeline.py)
    -> backbone forward per chunk (all chunks batched; constant compiled
       shapes regardless of clip duration)
    -> EXACT streaming aggregation at the attention-pooling layer:
       each head's output is sum_t(att*cla)/sum_t(att), which decomposes
       over time chunks, so summing the per-chunk partial sums reproduces
       pooling over the full sequence (models/pooling.py return_stats).

Only the convolutional receptive field at chunk boundaries differs from a
hypothetical monolithic run (which would not fit static-shape compilation);
the pooling aggregation itself is exact. For models whose output is not a
time-linear pool (MBNet's global-average-pool -> classifier), chunk
probabilities are combined by frame-count-weighted averaging instead.

Padding semantics per chunk match the reference eval path: a final partial
chunk is zero-padded in the log-mel domain before normalization
(src/dataloaders/audioset_dataset.py:125-132).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from psla_tpu.frontend import augment
from psla_tpu.frontend.pipeline import PreprocessConfig, _logmel


@functools.partial(jax.jit, static_argnames=("config",))
def _chunk_logmel(wav, wav_mean, lengths, config: PreprocessConfig):
    """Eval preprocessing over a [N, chunk_samples] chunk batch."""
    wav = augment.dc_remove(wav, wav_mean, lengths)
    logmel = _logmel(wav, lengths, config)
    if not config.skip_norm:
        logmel = augment.normalize(logmel, config.norm_mean, config.norm_std)
    return logmel


def aggregate_stats(stats: dict) -> jax.Array:
    """Combine per-chunk pooling stats -> [n_class] probabilities.

    ``s1``/``s0`` carry a leading chunk axis (any extra leading axes are
    summed too — chunks and batch-of-chunks alike); ``head_weight`` is the
    per-model [H] constant (a stack of identical rows also works).
    """
    s1 = jnp.asarray(stats["s1"])
    s0 = jnp.asarray(stats["s0"])
    reduce_axes = tuple(range(s1.ndim - 2))
    s1 = jnp.sum(s1, axis=reduce_axes)  # [H, n_class]
    s0 = jnp.sum(s0, axis=reduce_axes)
    hw = jnp.asarray(stats["head_weight"]).reshape(-1, s1.shape[0])[0]
    return jnp.einsum("ho,h->o", s1 / s0, hw)


@functools.lru_cache(maxsize=8)
def _jitted_applies(model):
    """Per-model jitted apply fns (flax modules are frozen dataclasses,
    so they key an lru_cache). Without this, every predict_long call —
    e.g. each long-clip request in tools/serve.py — would build a fresh
    jax.jit wrapper and pay a full XLA recompile."""
    return (
        jax.jit(lambda v, x: model.apply(v, x, train=False, return_stats=True)),
        jax.jit(lambda v, x: model.apply(v, x, train=False)),
    )


def predict_long(
    model,
    variables,
    waveform: np.ndarray,
    config: PreprocessConfig,
    chunk_batch: int = 8,
) -> np.ndarray:
    """[n_samples] waveform of ANY length -> [n_class] probabilities.

    Runs ceil(frames/target_length) chunks through the model in fixed-size
    minibatches of ``chunk_batch`` (one compiled program reused for every
    clip duration) and aggregates exactly at the pooling layer.
    """
    waveform = np.asarray(waveform, dtype=np.float32)
    chunk_samples = config.fbank.buffer_length(config.target_length)
    n = waveform.size
    n_chunks = max(1, -(-n // chunk_samples))
    padded = np.zeros(n_chunks * chunk_samples, dtype=np.float32)
    padded[:n] = waveform
    chunks = padded.reshape(n_chunks, chunk_samples)
    # DC removal uses the FULL-clip mean (the reference subtracts the clip
    # mean before fbank, audioset_dataset.py:96-100).
    mean = np.float32(waveform.mean()) if n else np.float32(0.0)
    lengths = np.minimum(
        np.maximum(n - np.arange(n_chunks) * chunk_samples, 0), chunk_samples
    ).astype(np.int32)

    # exact streaming aggregation needs the pooling head's partial sums:
    # probe the model's signature for return_stats (robust against error
    # message wording, unlike TypeError sniffing)
    import inspect

    supports_stats = "return_stats" in inspect.signature(
        type(model).__call__
    ).parameters
    apply_stats, apply_probs = _jitted_applies(model)

    stats_acc = None
    probs_acc = 0.0
    weight_acc = 0.0
    for lo in range(0, n_chunks, chunk_batch):
        idx = slice(lo, min(lo + chunk_batch, n_chunks))
        batch = chunks[idx]
        blen = lengths[idx]
        pad_rows = chunk_batch - batch.shape[0]
        if pad_rows:  # keep a single compiled shape
            batch = np.pad(batch, ((0, pad_rows), (0, 0)))
            blen = np.pad(blen, (0, pad_rows))
        logmel = _chunk_logmel(
            jnp.asarray(batch),
            jnp.full((chunk_batch,), mean, jnp.float32),
            jnp.asarray(blen),
            config,
        )
        valid = batch.shape[0] - pad_rows if pad_rows else batch.shape[0]
        if supports_stats:
            st = apply_stats(variables, logmel)
            # fold the batch axis into the chunk axis (head_weight is a
            # per-model constant, NOT per-chunk — do not slice it)
            piece = {
                "s1": np.asarray(st["s1"])[:valid, None],
                "s0": np.asarray(st["s0"])[:valid, None],
                "head_weight": np.asarray(st["head_weight"]),
            }
            if stats_acc is None:
                stats_acc = piece
            else:
                stats_acc = {
                    "s1": np.concatenate([stats_acc["s1"], piece["s1"]]),
                    "s0": np.concatenate([stats_acc["s0"], piece["s0"]]),
                    "head_weight": piece["head_weight"],
                }
        else:
            probs = np.asarray(apply_probs(variables, logmel))[:valid]
            w = np.maximum(blen[:valid].astype(np.float64), 1.0)
            probs_acc = probs_acc + (probs * w[:, None]).sum(0)
            weight_acc += w.sum()

    if supports_stats:
        return np.asarray(aggregate_stats(stats_acc))
    return (probs_acc / weight_acc).astype(np.float32)
