"""Attention pooling heads over time, vectorized for the MXU.

Reproduces the math of the reference pooling heads (src/models/
HigherModels.py): per head, two 1x1 convolutions (attention + classifier)
with sigmoid activations; attention clamped to [1e-7, 1-1e-7] and normalized
over time; output is the attention-weighted sum of classifier probabilities,
combined across heads with a learnable head weight initialized to 1/H
(HigherModels.py:63-82, 144-166).

TPU-first differences:
  * The reference loops over heads with separate convs
    (HigherModels.py:149-163); here ALL heads' att+cla projections are one
    DenseGeneral — a single [C, H*2*n_out] GEMM on the MXU.
  * Inputs are the time-major feature sequence [B, T, C] (the reference
    carries a dummy trailing axis through Conv2d).

Streaming: every head's output is a ratio of time sums,
``sum_t att*cla / sum_t att``, so pooling decomposes exactly over time
chunks. With ``return_stats=True`` each pool returns the partial sums
``{"s1": [B, H, n_out], "s0": [B, H, n_out], "head_weight": [H]}``;
summing s1/s0 over chunks and finishing with
``einsum('bho,h->bo', s1/s0, head_weight)`` reproduces pooling over the
concatenated sequence bit-for-bit (up to f32 summation order). This backs
arbitrary-length inference (the reference README advertises hour-level
audio but ships no code for it, README.md:29, 267-268).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

EPSILON = 1e-7


def _psla_uniform(fan_in: int):
    """Reference head init (HigherModels.py:6-18): U(-a, a),
    a = sqrt(3)*sqrt(2/fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        a = math.sqrt(2.0 / fan_in) * math.sqrt(3.0)
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


class MultiHeadAttentionPool(nn.Module):
    """[B, T, C] -> [B, n_out] probabilities; H attention heads."""

    n_out: int
    head_num: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_stats: bool = False):
        c = x.shape[-1]
        x = x.astype(self.dtype)
        # One fused projection for every head's (att, cla) pair.
        y = nn.DenseGeneral(
            features=(self.head_num, 2, self.n_out),
            axis=-1,
            kernel_init=_psla_uniform(c),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="heads",
        )(x)  # [B, T, H, 2, n_out]
        y = nn.sigmoid(y.astype(jnp.float32))
        att, cla = y[..., 0, :], y[..., 1, :]  # [B, T, H, n_out]
        att = jnp.clip(att, EPSILON, 1.0 - EPSILON)
        head_weight = self.param(
            "head_weight",
            lambda key, shape: jnp.full(shape, 1.0 / self.head_num, jnp.float32),
            (self.head_num,),
        )
        if return_stats:
            return {
                "s1": jnp.sum(att * cla, axis=1),
                "s0": jnp.sum(att, axis=1),
                "head_weight": head_weight,
            }
        norm_att = att / jnp.sum(att, axis=1, keepdims=True)
        per_head = jnp.sum(norm_att * cla, axis=1)  # [B, H, n_out]
        return jnp.einsum("bho,h->bo", per_head, head_weight)


class AttentionPool(nn.Module):
    """Single-head attention pooling (HigherModels.py:23-82)."""

    n_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_stats: bool = False):
        c = x.shape[-1]
        x = x.astype(self.dtype)
        y = nn.DenseGeneral(
            features=(2, self.n_out),
            axis=-1,
            kernel_init=_psla_uniform(c),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="att_cla",
        )(x)  # [B, T, 2, n_out]
        y = nn.sigmoid(y.astype(jnp.float32))
        att, cla = y[..., 0, :], y[..., 1, :]
        att = jnp.clip(att, EPSILON, 1.0 - EPSILON)
        if return_stats:
            return {
                "s1": jnp.sum(att * cla, axis=1, keepdims=True),
                "s0": jnp.sum(att, axis=1, keepdims=True),
                "head_weight": jnp.ones((1,), jnp.float32),
            }
        norm_att = att / jnp.sum(att, axis=1, keepdims=True)
        return jnp.sum(norm_att * cla, axis=1)


class MeanPool(nn.Module):
    """Classifier + sigmoid + mean over time (HigherModels.py:84-115)."""

    n_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_stats: bool = False):
        c = x.shape[-1]
        y = nn.Dense(
            self.n_out,
            kernel_init=_psla_uniform(c),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="cla",
        )(x.astype(self.dtype))
        probs = nn.sigmoid(y.astype(jnp.float32))
        if return_stats:
            t = x.shape[1]
            return {
                "s1": jnp.sum(probs, axis=1)[:, None, :],
                "s0": jnp.full(
                    (x.shape[0], 1, self.n_out), float(t), jnp.float32
                ),
                "head_weight": jnp.ones((1,), jnp.float32),
            }
        return jnp.mean(probs, axis=1)
