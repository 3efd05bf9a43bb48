"""Flax MobileNetV2 classifier (reference: src/models/Models.py:45-60).

torchvision-compatible MobileNetV2 with a 1-channel stem and a linear
classifier + sigmoid over label_dim (the reference swaps in both,
Models.py:51-52). Note the reference's construction is actually broken at
the call site (run.py:110 passes a nonexistent ``args.effpretrain``); this
implementation is the working equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from psla_tpu.models.layers import ReferenceBatchNorm, conv_kernel_init, dense_kernel_init

BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# (expand_ratio, out_channels, num_blocks, first_stride)
INVERTED_RESIDUAL_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class _ConvBNReLU6(nn.Module):
    # Kept separate from layers.ConvBN on purpose: the flax param paths of
    # this module are a stable public format (orbax checkpoints +
    # models/convert.py's torchvision mobilenet_v2 mapping target them);
    # swapping the implementation class risks silent path drift for zero
    # functional gain.
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = ReferenceBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=jnp.float32,
            name="bn",
        )(x)
        if self.act:
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


class InvertedResidual(nn.Module):
    expand_ratio: int
    in_filters: int
    out_filters: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inputs = x
        hidden = self.in_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = _ConvBNReLU6(hidden, 1, dtype=self.dtype, name="expand")(x, train)
        x = _ConvBNReLU6(
            hidden, 3, stride=self.stride, groups=hidden, dtype=self.dtype,
            name="depthwise",
        )(x, train)
        x = _ConvBNReLU6(
            self.out_filters, 1, act=False, dtype=self.dtype, name="project"
        )(x, train)
        if self.stride == 1 and self.in_filters == self.out_filters:
            x = x + inputs
        return x


class MBNet(nn.Module):
    """MobileNetV2 + linear classifier + sigmoid. Input fbank [B, T, F]."""

    label_dim: int = 527
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.transpose(x, (0, 2, 1))[..., None]  # [B, F, T, 1]
        x = _ConvBNReLU6(32, 3, stride=2, dtype=self.dtype, name="stem")(x, train)
        in_f = 32
        idx = 0
        for t, c, n, s in INVERTED_RESIDUAL_SETTINGS:
            for i in range(n):
                x = InvertedResidual(
                    expand_ratio=t,
                    in_filters=in_f,
                    out_filters=c,
                    stride=s if i == 0 else 1,
                    dtype=self.dtype,
                    name=f"block_{idx}",
                )(x, train)
                in_f = c
                idx += 1
        x = _ConvBNReLU6(1280, 1, dtype=self.dtype, name="head")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(
            self.label_dim, kernel_init=dense_kernel_init, dtype=jnp.float32,
            name="classifier",
        )(x)
        return nn.sigmoid(x)
