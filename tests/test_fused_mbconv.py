"""Fused eval-mode MBConv kernel (ops/fused_mbconv.py) vs the flax block.

Parity oracle: MBConvBlock.apply(train=False) in f32. The kernel is
EXPERIMENTAL for performance (see PERF.md) but its numerics are exact:
BN folding, SAME-padding masks, SE gating and the residual all match to
f32 roundoff.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psla_tpu.models.efficientnet import MBConvBlock
from psla_tpu.ops import fold_block_params, fused_mbconv_eval


def _block_and_inputs(kernel, cin, cout, expand, h, w, seed=0):
    rng = np.random.default_rng(seed)
    blk = MBConvBlock(
        kernel=kernel, stride=1, expand_ratio=expand, in_filters=cin,
        out_filters=cout, se_ratio=0.25, drop_rate=0.0,
    )
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(seed), x, False)
    # non-trivial running stats so the BN fold is actually exercised
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
    "kernel,cin,cout,expand",
    [(3, 16, 16, 6), (5, 24, 16, 6), (3, 32, 16, 1), (3, 16, 24, 6)],
)
def test_fused_block_matches_flax(kernel, cin, cout, expand):
    blk, variables, x = _block_and_inputs(kernel, cin, cout, expand, 8, 24)
    ref = np.asarray(blk.apply(variables, x, False))
    folded = fold_block_params(variables["params"], variables["batch_stats"])
    got = np.asarray(fused_mbconv_eval(x, folded, kernel, fast=False, tile=64))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_fused_block_multi_tile_invariance():
    """Same result regardless of the row-tile split (halo/mask coverage)."""
    blk, variables, x = _block_and_inputs(3, 16, 16, 6, 10, 40, seed=3)
    folded = fold_block_params(variables["params"], variables["batch_stats"])
    a = np.asarray(fused_mbconv_eval(x, folded, 3, fast=False, tile=64))
    b = np.asarray(fused_mbconv_eval(x, folded, 3, fast=False, tile=400))
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)
    ref = np.asarray(blk.apply(variables, x, False))
    np.testing.assert_allclose(a, ref, atol=2e-6, rtol=1e-5)


def test_fast_mode_close():
    blk, variables, x = _block_and_inputs(3, 16, 16, 6, 8, 24, seed=5)
    ref = np.asarray(blk.apply(variables, x, False))
    folded = fold_block_params(variables["params"], variables["batch_stats"])
    got = np.asarray(fused_mbconv_eval(x, folded, 3, fast=True, tile=64))
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
