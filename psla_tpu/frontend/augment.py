"""On-device augmentations: SpecAugment, waveform mixup, noise, normalize.

Reproduces the semantics of the reference's CPU dataloader augmentations
(src/dataloaders/audioset_dataset.py:139-199) as pure functions of
``jax.random`` keys so they fuse into the jitted preprocessing graph:

  * SpecAugment — one frequency mask + one time mask per sample, matching
    ``torchaudio.transforms.FrequencyMasking/TimeMasking``: continuous
    uniform draws floored to an integer start/width (see _mask_axis),
    masked bins set to 0 (audioset_dataset.py:176-188).
  * Mixup — waveform-domain mixing with lambda ~ Beta(10, 10)
    (audioset_dataset.py:111-117); partner waveforms are supplied by the
    host pipeline (uniformly sampled over the dataset, matching
    audioset_dataset.py:153) and are mixed per-sample under a Bernoulli
    (mixup_rate) gate (audioset_dataset.py:147).
  * Noise — fbank + U[0,1]*u/10 and a random time roll in [-10, 10)
    (audioset_dataset.py:197-199).
  * Normalize — (x - mean) / std (audioset_dataset.py:190-192).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_axis(
    key: jax.Array, size: int, mask_param: int
) -> jax.Array:
    """One torchaudio-style mask over an axis of length `size`.

    Returns a float32 keep-mask of shape [size] (1 = keep, 0 = masked).
    Exactly torchaudio.functional.mask_along_axis: draw value ~ U(0,
    mask_param) and min_value ~ U(0, size - value) as continuous numbers,
    then mask the INTEGER range [floor(min_value), floor(min_value) +
    floor(value)) — the floors matter (masked width is floor(value), so
    e.g. value=0.9 masks nothing), not just the continuous interval.
    """
    k1, k2 = jax.random.split(key)
    value = jax.random.uniform(k1) * mask_param
    min_value = jax.random.uniform(k2) * (size - value)
    start = jnp.floor(min_value)
    width = jnp.floor(value)
    idx = jnp.arange(size, dtype=jnp.float32)
    masked = (idx >= start) & (idx < start + width)
    return jnp.where(masked, 0.0, 1.0)


def spec_augment(
    key: jax.Array,
    fbank: jax.Array,
    freq_mask: int,
    time_mask: int,
) -> jax.Array:
    """Per-sample SpecAugment on [B, T, F] log-mels (fill value 0).

    Applied BEFORE normalization, like the reference
    (audioset_dataset.py:176-195), so masked bins become (0 - mean)/std
    after the subsequent normalize().
    """
    b, t, f = fbank.shape
    fkeys, tkeys = jax.random.split(key)
    out = fbank
    if freq_mask != 0:
        fm = jax.vmap(lambda k: _mask_axis(k, f, freq_mask))(
            jax.random.split(fkeys, b)
        )
        out = out * fm[:, None, :]
    if time_mask != 0:
        tm = jax.vmap(lambda k: _mask_axis(k, t, time_mask))(
            jax.random.split(tkeys, b)
        )
        out = out * tm[:, :, None]
    return out


def mixup_waveforms(
    key: jax.Array,
    wav: jax.Array,
    wav_mean: jax.Array,
    lengths: jax.Array,
    partner_wav: jax.Array,
    partner_mean: jax.Array,
    partner_lengths: jax.Array,
    labels: jax.Array,
    partner_labels: jax.Array,
    mixup_rate: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Waveform-domain mixup over a batch of fixed-size buffers.

    Matches _wav2fbank's mixup branch (audioset_dataset.py:94-117,147-165):
      1. both waveforms are DC-removed (mean over their TRUE length),
      2. the partner is cut/zero-padded to the primary's length,
      3. mix = lam * w1 + (1 - lam) * w2, lam ~ Beta(10, 10),
      4. the mix is DC-removed again (mean over the primary's length),
      5. labels = lam * onehot1 + (1 - lam) * onehot2.
    Samples not selected by the Bernoulli(mixup_rate) gate pass through with
    single-sample DC removal and one-hot labels (audioset_dataset.py:167-174).

    Args:
      wav / partner_wav: [B, N] zero-padded raw buffers.
      wav_mean / partner_mean: [B] mean over the clip's true length,
        computed host-side over the FULL clip (so clips longer than the
        buffer still use the full-clip mean, as the reference does).
      lengths / partner_lengths: [B] int32 true sample counts (clipped to N).
      labels / partner_labels: [B, C] multi-hot label vectors.

    Returns (mixed_wav [B, N], mixed_labels [B, C], lam [B]).
    """
    b, n = wav.shape
    k_gate, k_lam = jax.random.split(key)
    do_mix = jax.random.uniform(k_gate, (b,)) < mixup_rate
    lam = jax.random.beta(k_lam, 10.0, 10.0, (b,)).astype(jnp.float32)

    pos = jnp.arange(n)[None, :]
    valid1 = pos < lengths[:, None]
    # DC-removed primaries / partners over true lengths; padding stays 0.
    w1 = jnp.where(valid1, wav - wav_mean[:, None], 0.0)
    # Partner cut to primary length (zero-pad beyond its own length).
    valid2 = (pos < partner_lengths[:, None]) & valid1
    w2 = jnp.where(valid2, partner_wav - partner_mean[:, None], 0.0)

    mix = lam[:, None] * w1 + (1.0 - lam[:, None]) * w2
    # Second DC removal over the primary's true length.
    mix_mean = jnp.sum(mix, axis=1) / jnp.maximum(lengths, 1).astype(jnp.float32)
    mix = jnp.where(valid1, mix - mix_mean[:, None], 0.0)

    out_wav = jnp.where(do_mix[:, None], mix, w1)
    lam_eff = jnp.where(do_mix, lam, 1.0)
    out_labels = (
        lam_eff[:, None] * labels + (1.0 - lam_eff)[:, None] * partner_labels
    )
    return out_wav, out_labels, lam_eff


def dc_remove(wav: jax.Array, wav_mean: jax.Array, lengths: jax.Array) -> jax.Array:
    """Single-sample DC removal (audioset_dataset.py:91-92) on [B, N] buffers."""
    pos = jnp.arange(wav.shape[-1])[None, :]
    valid = pos < lengths[:, None]
    return jnp.where(valid, wav - wav_mean[:, None], 0.0)


def normalize(fbank: jax.Array, mean: float, std: float) -> jax.Array:
    """(x - mean) / std (audioset_dataset.py:190-192)."""
    return (fbank - mean) / std


def add_noise(key: jax.Array, fbank: jax.Array) -> jax.Array:
    """Reference noise augmentation (audioset_dataset.py:197-199).

    fbank += U[0,1](T,F) * u/10 with u ~ U[0,1] per sample, then a circular
    time-roll by an integer in [-10, 10).
    """
    b, t, f = fbank.shape
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (b, 1, 1))
    noise = jax.random.uniform(k2, (b, t, f)) * u / 10.0
    out = fbank + noise
    shifts = jax.random.randint(k3, (b,), -10, 10)
    idx = (jnp.arange(t)[None, :] - shifts[:, None]) % t
    return jnp.take_along_axis(out, idx[:, :, None], axis=1)
