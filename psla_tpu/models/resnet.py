"""Flax ResNet50 + attention pooling (reference: src/models/Models.py:7-43).

torchvision-compatible ResNet50 feature extractor (1-channel stem, explicit
torch-style padding so converted checkpoints are numerically identical),
followed by the single-head attention pool. The reference hardcodes a
[B, 2048, 4, 33] reshape valid only for target_length 1056 (Models.py:39);
here the natural NHWC feature map is used directly, so any input length
works.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from psla_tpu.models.layers import ReferenceBatchNorm, conv_kernel_init
from psla_tpu.models.pooling import AttentionPool

BN_MOMENTUM = 0.9  # torch momentum 0.1
BN_EPS = 1e-5


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
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
            x = nn.relu(x)
        return x


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _ConvBN(self.planes, 1, dtype=self.dtype, name="conv1")(x, train)
        out = _ConvBN(
            self.planes, 3, stride=self.stride, pad=1, dtype=self.dtype, name="conv2"
        )(out, train)
        out = _ConvBN(
            self.planes * 4, 1, act=False, dtype=self.dtype, name="conv3"
        )(out, train)
        if self.downsample:
            identity = _ConvBN(
                self.planes * 4, 1, stride=self.stride, act=False,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """Feature extractor: NHWC input -> [B, H/32, W/32, 2048]."""

    in_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = _ConvBN(64, 7, stride=2, pad=3, dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        for stage, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for i in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
        return x


class ResNetAttention(nn.Module):
    """ResNet50 backbone + single-head attention pool (Models.py:7-43)."""

    label_dim: int = 527
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_stats: bool = False):
        # [B, T, F] -> [B, F, T, 1]
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        feats = ResNet50(dtype=self.dtype, name="resnet")(x, train=train)
        feats = jnp.mean(feats, axis=1)  # [B, T', 2048]
        return AttentionPool(self.label_dim, dtype=self.dtype, name="attention")(
            feats, return_stats=return_stats
        )
