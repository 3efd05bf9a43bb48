"""Fused on-device preprocessing graph: waveform batch -> normalized fbank.

Composes the frontend stages in the reference's exact order
(src/dataloaders/audioset_dataset.py:139-202):

    mixup(waveform) -> kaldi fbank -> pad/truncate to target_length
    -> SpecAugment (train only) -> (x - mean)/std -> optional noise

The whole graph is jit-compiled and runs on TPU as part of the train/eval
step, replacing the reference's CPU DataLoader workers. The host pipeline
only decodes WAVs into fixed-size zero-padded buffers (see data/loader.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from psla_tpu.frontend import augment
from psla_tpu.frontend.fbank import FbankConfig, fbank_batched
from psla_tpu.frontend.fbank_pallas import fbank_pallas


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Static preprocessing parameters (the reference's audio_conf dict,
    src/run.py:74-80)."""

    fbank: FbankConfig = FbankConfig()
    target_length: int = 1056
    freq_mask: int = 48
    time_mask: int = 192
    mixup_rate: float = 0.5
    norm_mean: float = -4.6476
    norm_std: float = 4.5699
    skip_norm: bool = False
    noise: bool = False
    # 'fft' | 'gemm' (XLA lowerings, fbank.py) | 'pallas' (fused TPU kernel,
    # fbank_pallas.py; interpreted off-TPU) | 'auto' (pallas on TPU — the
    # most accurate lowering there (1.1e-4 vs golden, rfft is 3.4e-4) —
    # fft elsewhere, where rfft is near-exact).
    fbank_method: str = "auto"

    @property
    def num_mel_bins(self) -> int:
        return self.fbank.num_mel_bins

    def eval_variant(self) -> "PreprocessConfig":
        """The val_audio_conf analogue: no masking/mixup/noise (run.py:78-80)."""
        return dataclasses.replace(
            self, freq_mask=0, time_mask=0, mixup_rate=0.0, noise=False
        )


def wav_buffer_length(config: PreprocessConfig) -> int:
    """Host-side waveform buffer size: smallest sample count that covers
    target_length frames. Longer clips are cut host-side (only the first
    buffer_length samples can influence the first target_length frames)."""
    return config.fbank.buffer_length(config.target_length)


class WavBatch(NamedTuple):
    """Fixed-shape device batch produced by the host pipeline."""

    # [B, N] f32 zero-padded raw waveform buffers. Loaders may ship these
    # as int16 wire arrays (ExperimentConfig.wire); the jitted steps
    # dequantize before constructing the WavBatch (train/step._wav_batch),
    # so consumers here always see float32.
    wav: jax.Array
    wav_mean: jax.Array  # [B] full-clip mean (host-computed over all samples)
    length: jax.Array  # [B] int32 true sample count, clipped to N
    labels: jax.Array  # [B, C] f32 multi-hot labels
    # Mixup partners (uniformly sampled over the dataset, host-side).
    # For eval batches these may alias the primary fields; unused then.
    mix_wav: jax.Array
    mix_wav_mean: jax.Array
    mix_length: jax.Array
    mix_labels: jax.Array


def _logmel(wav, lengths, config: PreprocessConfig) -> jax.Array:
    """fbank + pad/truncate to target_length by the configured lowering."""
    method = config.fbank_method
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "fft"
    if method == "pallas":
        return fbank_pallas(
            wav, lengths, config=config.fbank, target_frames=config.target_length
        )
    logmel, _ = fbank_batched(wav, lengths, config=config.fbank, method=method)
    return _pad_or_truncate(logmel, config.target_length)


def _pad_or_truncate(logmel: jax.Array, target_length: int) -> jax.Array:
    """Zero-pad or cut the time axis to target_length
    (audioset_dataset.py:125-132). logmel: [B, M, F]."""
    m = logmel.shape[1]
    if m >= target_length:
        return logmel[:, :target_length, :]
    pad = target_length - m
    return jnp.pad(logmel, ((0, 0), (0, pad), (0, 0)))


@functools.partial(jax.jit, static_argnames=("config",))
def preprocess_train(
    key: jax.Array, batch: WavBatch, config: PreprocessConfig
) -> tuple[jax.Array, jax.Array]:
    """Training preprocessing. Returns (fbank [B, T, F], labels [B, C])."""
    k_mix, k_spec, k_noise = jax.random.split(key, 3)

    if config.mixup_rate > 0.0:
        wav, labels, _ = augment.mixup_waveforms(
            k_mix,
            batch.wav,
            batch.wav_mean,
            batch.length,
            batch.mix_wav,
            batch.mix_wav_mean,
            batch.mix_length,
            batch.labels,
            batch.mix_labels,
            config.mixup_rate,
        )
    else:
        wav = augment.dc_remove(batch.wav, batch.wav_mean, batch.length)
        labels = batch.labels

    logmel = _logmel(wav, batch.length, config)

    logmel = augment.spec_augment(k_spec, logmel, config.freq_mask, config.time_mask)
    if not config.skip_norm:
        logmel = augment.normalize(logmel, config.norm_mean, config.norm_std)
    if config.noise:
        logmel = augment.add_noise(k_noise, logmel)
    return logmel, labels


@functools.partial(jax.jit, static_argnames=("config",))
def preprocess_eval(batch: WavBatch, config: PreprocessConfig) -> jax.Array:
    """Eval preprocessing: DC removal -> fbank -> pad/cut -> normalize."""
    wav = augment.dc_remove(batch.wav, batch.wav_mean, batch.length)
    logmel = _logmel(wav, batch.length, config)
    if not config.skip_norm:
        logmel = augment.normalize(logmel, config.norm_mean, config.norm_std)
    return logmel
