"""int8 activation compression for backward saves (PERF.md roadmap item).

The train step is HBM-bandwidth-bound: ~79% of device time is conv
fusions at ~70% BW utilization, dominated by the MBConv EXPANDED
intermediates (e.g. bf16[128,64,528,96]) that backward re-reads for the
depthwise weight-grad (PERF.md "Where the time goes"). Two candidate
compressions of that traffic, both centred on the depthwise conv whose
input is the largest tensor in the block:

* ``q8save`` — exact forward; the depthwise conv saves its input as
  per-channel-scaled int8 for the WEIGHT gradient only (the data gradient
  of a conv is linear in the cotangent and never needs the input). Only
  the wgrad read is compressed; the int8 copy is an extra forward write,
  so net HBM traffic is roughly neutral by first-order accounting —
  measured on-chip to decide.
* ``qdq`` — straight-through quantize-dequantize of the expanded
  activation before the depthwise conv. If XLA materializes the
  inter-fusion buffer as int8, forward read + backward read + write all
  halve; costs forward accuracy (~0.4% per-tensor relative error).

Gradient-error bounds for both are measured by
``tests/test_qsave.py`` (CPU) and the speed verdict by
``bench.py --act-compress`` on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


def quantize_int8(x: jax.Array, axis: int = -1):
    """Per-channel symmetric int8: returns (q int8, scale f32[C])."""
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis % x.ndim)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-12) / INT8_MAX
    shape = [1] * x.ndim
    shape[axis % x.ndim] = -1
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale.reshape(shape)),
        -INT8_MAX, INT8_MAX,
    ).astype(jnp.int8)
    return q, scale


def dequantize_int8(q: jax.Array, scale: jax.Array, axis: int, dtype):
    shape = [1] * q.ndim
    shape[axis % q.ndim] = -1
    return (q.astype(jnp.float32) * scale.reshape(shape)).astype(dtype)


def qdq(x: jax.Array, axis: int = -1) -> jax.Array:
    """Straight-through quantize-dequantize: int8 values in the forward,
    identity gradient in the backward."""
    q, scale = quantize_int8(x, axis)
    deq = dequantize_int8(q, scale, axis, x.dtype)
    return x + jax.lax.stop_gradient(deq - x)


def _dw_conv(x, kernel, strides, padding):
    """Depthwise conv, NHWC / HWIO [k,k,1,C]."""
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=strides,
        padding=padding,
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dw_conv_q8save(x, kernel, strides, padding):
    """Depthwise conv whose backward reads the input as int8.

    Forward output is EXACT (full-precision conv). The residual stores x
    as (int8, per-channel scale); the weight gradient dequantizes it, so
    only dL/dkernel carries quantization error — dL/dx is exact (linear
    in the cotangent, independent of x).
    """
    return _dw_conv(x, kernel, strides, padding)


def _q8save_fwd(x, kernel, strides, padding):
    y = _dw_conv(x, kernel, strides, padding)
    q, scale = quantize_int8(x, axis=-1)
    return y, (q, scale, kernel)


def _q8save_bwd(strides, padding, res, g):
    q, scale, kernel = res
    # x and kernel share a dtype at every call site (ConvBN casts both)
    xq = dequantize_int8(q, scale, -1, kernel.dtype)
    _, vjp = jax.vjp(lambda xx, kk: _dw_conv(xx, kk, strides, padding),
                     xq, kernel)
    dx, dk = vjp(g)
    return dx, dk


dw_conv_q8save.defvjp(_q8save_fwd, _q8save_bwd)
