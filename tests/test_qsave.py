"""int8 activation compression (ops/qsave.py): numerics bounds.

Speed verdict lives in PERF.md (measured on the real chip via
``bench.py --act-compress``); these tests pin the CORRECTNESS claims:
q8save's forward and data-grad are exact, only the depthwise weight-grad
carries (bounded) quantization error, and the parameter tree is unchanged
so checkpoints are interchangeable across modes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psla_tpu.models import EffNetAttention
from psla_tpu.ops.qsave import (
    dequantize_int8,
    dw_conv_q8save,
    qdq,
    quantize_int8,
)


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16).astype(np.float32))
    q, scale = quantize_int8(x, axis=-1)
    assert q.dtype == jnp.int8
    deq = dequantize_int8(q, scale, -1, jnp.float32)
    # per-channel int8: error bounded by scale/2 = amax/254 per channel
    amax = np.abs(np.asarray(x)).max(axis=(0, 1, 2))
    err = np.abs(np.asarray(deq) - np.asarray(x)).max(axis=(0, 1, 2))
    assert np.all(err <= amax / 254 + 1e-7)


def test_qdq_straight_through_gradient():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 8), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(jnp.sin(qdq(v))))(x)
    g_ref = jax.grad(lambda v: jnp.sum(jnp.sin(v)))(x)
    # straight-through: gradient flows as if qdq were identity (evaluated
    # at the quantized point, which is what STE means)
    assert g.shape == g_ref.shape
    assert np.all(np.isfinite(np.asarray(g)))
    # and the forward is the quantized value
    np.testing.assert_allclose(
        np.asarray(qdq(x)),
        np.asarray(dequantize_int8(*quantize_int8(x, -1), -1, jnp.float32)),
        atol=1e-7,
    )


def test_q8save_forward_exact_and_grads_bounded():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 1, 8).astype(np.float32) * 0.2)

    def ref(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, (1, 1), "SAME", feature_group_count=8,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # forward EXACT
    y = dw_conv_q8save(x, k, (1, 1), "SAME")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref(x, k)))

    dx_q, dk_q = jax.grad(
        lambda xx, kk: jnp.sum(dw_conv_q8save(xx, kk, (1, 1), "SAME") ** 2),
        argnums=(0, 1),
    )(x, k)
    dx_r, dk_r = jax.grad(
        lambda xx, kk: jnp.sum(ref(xx, kk) ** 2), argnums=(0, 1)
    )(x, k)
    # data grad: linear in the cotangent, x enters only through the
    # cotangent 2y (exact y) -> exact up to f32 noise
    np.testing.assert_allclose(np.asarray(dx_q), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    # weight grad: carries int8 error, bounded ~0.5% relative
    rel = np.linalg.norm(np.asarray(dk_q - dk_r)) / np.linalg.norm(
        np.asarray(dk_r)
    )
    assert rel < 5e-3, rel
    cos = float(
        np.sum(np.asarray(dk_q) * np.asarray(dk_r))
        / (np.linalg.norm(np.asarray(dk_q)) * np.linalg.norm(np.asarray(dk_r)))
    )
    assert cos > 0.99999, cos


@pytest.mark.parametrize("mode", ["q8save", "qdq"])
def test_model_grads_close_and_tree_unchanged(mode):
    """Whole-model gradients under compression stay aligned with the
    baseline, and the param tree is IDENTICAL (checkpoints interchange)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 128).astype(np.float32) * 0.5)
    y = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1]])

    base = EffNetAttention(label_dim=3, b=0, head_num=1, drop_connect_rate=0.0)
    comp = EffNetAttention(label_dim=3, b=0, head_num=1, drop_connect_rate=0.0,
                           act_compress=mode)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)

    # identical tree -> compressed model consumes the baseline's params
    v2 = comp.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        p = jnp.clip(out, 1e-7, 1 - 1e-7)
        return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log1p(-p))

    l_b, g_b = jax.value_and_grad(lambda p: loss(base, p))(variables["params"])
    l_c, g_c = jax.value_and_grad(lambda p: loss(comp, p))(variables["params"])

    if mode == "q8save":
        assert abs(float(l_b) - float(l_c)) < 1e-6  # exact forward
    else:
        # qdq genuinely perturbs the forward: ~0.017 absolute on a ~0.68
        # BCE at init (16 quantized depthwise inputs compound through
        # train-mode BN). This magnitude is WHY qdq is accuracy-lossy —
        # documented here, speed verdict in PERF.md.
        assert abs(float(l_b) - float(l_c)) < 5e-2

    fb = np.concatenate([np.ravel(t) for t in jax.tree.leaves(g_b)])
    fc = np.concatenate([np.ravel(t) for t in jax.tree.leaves(g_c)])
    cos = float(np.dot(fb, fc) / (np.linalg.norm(fb) * np.linalg.norm(fc)))
    # measured at init: q8save ~0.9999+ (only dw wgrads perturbed);
    # qdq ~0.958 — the forward perturbation propagates into EVERY
    # gradient through train-mode BN, a real accuracy risk (PERF.md)
    assert cos > (0.999 if mode == "q8save" else 0.9), cos
