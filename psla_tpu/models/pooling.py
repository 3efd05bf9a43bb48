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
    def __call__(self, x):
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
        norm_att = att / jnp.sum(att, axis=1, keepdims=True)
        per_head = jnp.sum(norm_att * cla, axis=1)  # [B, H, n_out]
        head_weight = self.param(
            "head_weight",
            lambda key, shape: jnp.full(shape, 1.0 / self.head_num, jnp.float32),
            (self.head_num,),
        )
        return jnp.einsum("bho,h->bo", per_head, head_weight)


class AttentionPool(nn.Module):
    """Single-head attention pooling (HigherModels.py:23-82)."""

    n_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
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
        norm_att = att / jnp.sum(att, axis=1, keepdims=True)
        return jnp.sum(norm_att * cla, axis=1)


class MeanPool(nn.Module):
    """Classifier + sigmoid + mean over time (HigherModels.py:84-115)."""

    n_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.Dense(
            self.n_out,
            kernel_init=_psla_uniform(c),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="cla",
        )(x.astype(self.dtype))
        return jnp.mean(nn.sigmoid(y.astype(jnp.float32)), axis=1)
