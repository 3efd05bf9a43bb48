"""Whole-map-in-VMEM fused MBConv kernel (ops/mbconv_vmem.py) vs flax.

Parity oracle: MBConvBlock.apply(train=False) in f32, BN folded via
fold_block_params. Covers stride 1 and stride 2 (W-parity-plane path),
k3/k5, expand/no-expand, odd spatial extents, and the residual skip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psla_tpu.models.efficientnet import MBConvBlock
from psla_tpu.ops.fused_mbconv import fold_block_params
from psla_tpu.ops.mbconv_vmem import fused_mbconv_eval_v2, same_pad


def _block_and_inputs(kernel, stride, cin, cout, expand, h, w, seed=0):
    rng = np.random.default_rng(seed)
    blk = MBConvBlock(
        kernel=kernel, stride=stride, expand_ratio=expand, in_filters=cin,
        out_filters=cout, se_ratio=0.25, drop_rate=0.0,
    )
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(seed), x, False)
    stats = jax.tree.map(
        lambda a: jnp.abs(
            jnp.asarray(
                rng.standard_normal(a.shape).astype(np.float32) * 0.2 + 1.0
            )
        ),
        variables["batch_stats"],
    )
    return blk, dict(variables, batch_stats=stats), x


@pytest.mark.parametrize(
    "kernel,stride,cin,cout,expand,h,w",
    [
        (3, 1, 16, 16, 6, 8, 24),   # skip connection
        (5, 1, 24, 16, 6, 8, 24),   # k5
        (3, 1, 32, 16, 1, 8, 24),   # no expand (stage 1)
        (3, 2, 16, 24, 6, 8, 24),   # stride 2 (stage-2 block 0 shape class)
        (5, 2, 24, 48, 6, 10, 40),  # stride 2, k5 (stage-3 block 0)
        (3, 2, 16, 24, 6, 9, 25),   # stride 2, odd extents
        (5, 2, 24, 40, 6, 7, 23),   # stride 2, k5, odd extents
    ],
)
def test_v2_matches_flax(kernel, stride, cin, cout, expand, h, w):
    blk, variables, x = _block_and_inputs(kernel, stride, cin, cout, expand, h, w)
    ref = np.asarray(blk.apply(variables, x, False))
    folded = fold_block_params(variables["params"], variables["batch_stats"])
    got = np.asarray(fused_mbconv_eval_v2(x, folded, kernel, stride, fast=False))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-6, rtol=1e-5)


def test_v2_fast_mode_close():
    blk, variables, x = _block_and_inputs(3, 1, 16, 16, 6, 8, 24, seed=5)
    ref = np.asarray(blk.apply(variables, x, False))
    folded = fold_block_params(variables["params"], variables["batch_stats"])
    got = np.asarray(fused_mbconv_eval_v2(x, folded, 3, 1, fast=True))
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


def test_same_pad_matches_jax():
    for n in (7, 8, 24, 25, 132, 528):
        for k in (3, 5):
            for s in (1, 2):
                out, lo, hi = same_pad(n, k, s)
                # jax 'SAME' conv geometry oracle
                y = jax.lax.conv_general_dilated(
                    jnp.zeros((1, n, 1, 1)), jnp.zeros((k, 1, 1, 1)),
                    (s, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                assert y.shape[1] == out
                assert lo + n + hi == (out - 1) * s + k
