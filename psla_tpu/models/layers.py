"""Shared building blocks for the model zoo (TPU/XLA-friendly).

Convolutions use jax's 'SAME' padding, which implements TF-style asymmetric
padding — the same semantics as efficientnet_pytorch's
Conv2dStaticSamePadding, so pretrained-weight parity holds at stride-2 layers
(SURVEY.md §7.3 item 2). Layout is NHWC throughout (TPU-native), vs the
reference's NCHW.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def round_filters(filters: int, width_coefficient: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding (width scaling, snap to multiple of 8)."""
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:  # don't round down by more than 10%
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    """EfficientNet depth rounding (ceil)."""
    return int(math.ceil(depth_coefficient * repeats))


def drop_connect(
    x: jax.Array, rng: jax.Array, rate: float, deterministic: bool
) -> jax.Array:
    """Stochastic depth: drop the whole residual branch per sample.

    Matches the reference dependency's semantics: keep with probability
    1-rate, scale kept activations by 1/(1-rate); the Bernoulli draw is
    per-sample (batch dim), broadcast over feature dims.
    """
    if deterministic or rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, keep_prob, shape)
    return jnp.where(keep, x / keep_prob, 0.0)


class ReferenceBatchNorm(nn.BatchNorm):
    """flax BatchNorm with torch's running-variance convention.

    torch.nn.BatchNorm2d normalizes with the BIASED batch variance but
    accumulates the UNBIASED one (x n/(n-1)) into ``running_var``; flax
    accumulates the biased variance. The difference is invisible in train
    mode but skews every eval-mode forward of a self-trained model away
    from the reference — the protocol-twin test's valid-loss trajectories
    diverged measurably through the late layers' small spatial extents
    (n = batch x H x W as low as 64). The reference's models train under
    torch semantics (src/models/Models.py via efficientnet_pytorch), so
    the running-var update here applies the same n/(n-1) correction
    (verified against torch in tests/test_models.py).

    Normalization math, dtype handling, and state layout are flax's own —
    only the ``ra_var`` update line differs.
    """

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        from flax.linen import module as _module
        from flax.linen.normalization import (
            _canonicalize_axes,
            _compute_stats,
            _normalize,
        )

        use_running_average = _module.merge_param(
            "use_running_average",
            self.use_running_average,
            use_running_average,
        )
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes
        )
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stats_dtype = (
            jnp.float32 if self.force_float32_reductions else self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, stats_dtype), feature_shape,
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, stats_dtype), feature_shape,
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = _compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                force_float32_reductions=self.force_float32_reductions,
            )
            if not self.is_initializing():
                # the element count per channel behind `var`. With GSPMD
                # sharding x.shape is already the logical GLOBAL shape, so
                # the static product is the right n; under a named axis
                # (pmap/shard_map) _compute_stats psums the moments across
                # the axis, so the correction must scale n by the axis
                # size too.
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                if self.axis_name is not None:
                    n_total = n * jax.lax.psum(
                        jnp.ones((), stats_dtype),
                        self.axis_name,
                        axis_index_groups=self.axis_index_groups,
                    )
                    bessel = jnp.where(
                        n_total > 1, n_total / (n_total - 1), 1.0
                    )
                else:
                    bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * bessel
                )

        return _normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )


# (the pooling-head init from HigherModels.py:6-18 lives in
# models/pooling.py as _psla_uniform, next to its only users)
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
dense_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class _Kernel(nn.Module):
    """Holds a conv kernel under the standard 'conv/kernel' param path
    (for custom-conv paths that bypass nn.Conv, keeping checkpoints
    interchangeable)."""

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init, self.shape)


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm + optional activation, NHWC.

    act_compress (int8 activation compression experiment, ops/qsave.py;
    depthwise convs only — their input is the expanded MBConv tensor that
    dominates backward HBM traffic):
      'none'   — standard path;
      'q8save' — exact forward, weight-grad reads the input as int8;
      'qdq'    — straight-through int8 quantize-dequantize of the input.
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    groups: int = 1
    padding: str | tuple = "SAME"
    act: str | None = "silu"
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32
    act_compress: str = "none"

    @nn.compact
    def __call__(self, x, train: bool):
        compress = self.act_compress if self.groups > 1 else "none"
        if compress == "qdq":
            from psla_tpu.ops.qsave import qdq

            x = qdq(x, axis=-1)
        if compress == "q8save":
            from psla_tpu.ops.qsave import dw_conv_q8save

            kernel = _Kernel(
                self.kernel_size + (1, self.features), name="conv"
            )()
            x = dw_conv_q8save(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, self.padding,
            )
        elif compress not in ("none", "qdq"):
            raise ValueError(f"unknown act_compress {self.act_compress!r}")
        else:
            x = nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding=self.padding,
                feature_group_count=self.groups,
                use_bias=False,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        # BN computes in the activation dtype (bf16 keeps the whole
        # inter-conv activation stream half-width — HBM traffic dominates
        # this net at audio resolutions); flax always computes the batch
        # statistics themselves in float32, and params/running stats stay
        # float32 via param_dtype.
        x = ReferenceBatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act == "silu":
            x = nn.silu(x)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "relu6":
            x = jnp.minimum(nn.relu(x), 6.0)
        elif self.act is not None:
            raise ValueError(self.act)
        return x
