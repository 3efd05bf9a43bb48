"""Long-audio chunked inference (psla_tpu/inference.py).

The reference README promises hour-level inference with no code behind it
(README.md:29, 267-268); here the feature exists and its core invariant is
testable: pooling aggregated from per-chunk partial sums must equal pooling
over the concatenated feature sequence (models/pooling.py return_stats).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psla_tpu.frontend.fbank import FbankConfig
from psla_tpu.frontend.pipeline import PreprocessConfig
from psla_tpu.inference import aggregate_stats, predict_long
from psla_tpu.models import create_model
from psla_tpu.models.pooling import AttentionPool, MeanPool, MultiHeadAttentionPool

CFG = PreprocessConfig(target_length=64)


@pytest.mark.parametrize(
    "cls,kw",
    [
        (MultiHeadAttentionPool, {"head_num": 4}),
        (AttentionPool, {}),
        (MeanPool, {}),
    ],
)
def test_chunked_pooling_equals_full(cls, kw):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 24, 32)).astype(np.float32))
    pool = cls(n_out=7, **kw)
    variables = pool.init(jax.random.PRNGKey(0), feats)
    full = pool.apply(variables, feats)

    pieces = [feats[:, :10], feats[:, 10:17], feats[:, 17:]]
    stats = [pool.apply(variables, p, return_stats=True) for p in pieces]
    stacked = {
        "s1": jnp.stack([s["s1"] for s in stats]),
        "s0": jnp.stack([s["s0"] for s in stats]),
        "head_weight": jnp.stack([s["head_weight"] for s in stats]),
    }
    agg = aggregate_stats(stacked)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(full)[0], rtol=1e-5)


def _tiny_model():
    model = create_model("efficientnet", label_dim=11, eff_b=0, head_num=4)
    example = jnp.zeros((1, CFG.target_length, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), example, train=False)
    return model, variables


def test_single_chunk_matches_direct_forward():
    model, variables = _tiny_model()
    rng = np.random.default_rng(2)
    n = CFG.fbank.buffer_length(CFG.target_length)
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)

    out = predict_long(model, variables, wav, CFG, chunk_batch=4)

    from psla_tpu.frontend.pipeline import WavBatch, preprocess_eval

    batch = WavBatch(
        wav=jnp.asarray(wav)[None],
        wav_mean=jnp.asarray([wav.mean()], jnp.float32),
        length=jnp.asarray([n], jnp.int32),
        labels=jnp.zeros((1, 11)),
        mix_wav=jnp.asarray(wav)[None],
        mix_wav_mean=jnp.asarray([wav.mean()], jnp.float32),
        mix_length=jnp.asarray([n], jnp.int32),
        mix_labels=jnp.zeros((1, 11)),
    )
    logmel = preprocess_eval(batch, CFG)
    ref = np.asarray(model.apply(variables, logmel, train=False))[0]
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_multi_chunk_runs_and_is_probability():
    model, variables = _tiny_model()
    # perturb params (NOT batch_stats — negative running variance would NaN
    # the BatchNorm rsqrt) so outputs are non-degenerate
    params = variables["params"]
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [
        l + 0.3 * jax.random.normal(k, np.shape(l), jnp.float32).astype(l.dtype)
        for l, k in zip(leaves, keys)
    ]
    variables = dict(variables, params=jax.tree.unflatten(treedef, leaves))
    rng = np.random.default_rng(3)
    # 2.5 chunks long -> exercises padding of the final chunk AND of the
    # final chunk minibatch
    n = int(2.5 * CFG.fbank.buffer_length(CFG.target_length))
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    out = predict_long(model, variables, wav, CFG, chunk_batch=2)
    assert out.shape == (11,)
    assert np.all(np.isfinite(out))
    assert np.ptp(out) > 1e-4  # non-degenerate after perturbation
    # invariance to chunk_batch (same chunk grid, different minibatching)
    out2 = predict_long(model, variables, wav, CFG, chunk_batch=3)
    np.testing.assert_allclose(out, out2, rtol=1e-6)


def test_mbnet_falls_back_to_weighted_probs():
    model = create_model("mbnet", label_dim=5)
    example = jnp.zeros((1, CFG.target_length, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(4), example, train=False)
    rng = np.random.default_rng(5)
    n = int(1.5 * CFG.fbank.buffer_length(CFG.target_length))
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
    out = predict_long(model, variables, wav, CFG, chunk_batch=2)
    assert out.shape == (5,)
    assert np.all(out > 0) and np.all(out < 1)
