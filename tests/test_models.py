"""Model shape/param/grad tests (SURVEY.md §4b).

Includes the parity anchor the reference states in its README: the flagship
EfficientNet-B2 + 4-head attention model has 13.6M parameters total
(README.md:239), with the feature dim table middim = [1280, 1280, 1408,
1536, 1792, 2048, 2304, 2560] (Models.py:66).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psla_tpu.models import EffNetAttention, MBNet, ResNetAttention, create_model
from psla_tpu.models.efficientnet import EfficientNet, efficientnet_arch


MIDDIM = [1280, 1280, 1408, 1536, 1792, 2048, 2304, 2560]


@pytest.mark.parametrize("b", range(8))
def test_efficientnet_feature_dims_match_reference_table(b):
    assert efficientnet_arch(b)[2] == MIDDIM[b]


def test_efficientnet_b2_block_structure():
    _, blocks, _ = efficientnet_arch(2)
    repeats = [r for _, r in blocks]
    assert repeats == [2, 3, 3, 4, 4, 5, 2]  # depth 1.2 scaling
    outs = [a.out_filters for a, _ in blocks]
    assert outs == [16, 24, 48, 88, 120, 208, 352]  # width 1.1 scaling


def _param_count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_effnet_attention_shapes_and_params():
    model = EffNetAttention(label_dim=527, b=2, head_num=4)
    x = jnp.zeros((2, 1056, 128))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 527)
    assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))
    n = _param_count(variables["params"])
    # README.md:239: 13.6M parameters
    assert 13.0e6 < n < 14.2e6, n


def test_effnet_small_variant_runs_fast():
    model = EffNetAttention(label_dim=10, b=0, head_num=1)
    x = jnp.zeros((1, 128, 128))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 10)


def test_effnet_mean_pooling_head():
    model = EffNetAttention(label_dim=10, b=0, head_num=0)
    x = jnp.zeros((1, 128, 128))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert model.apply(variables, x, train=False).shape == (1, 10)


def test_effnet_train_mode_mutates_batch_stats_and_uses_dropout_rng():
    model = EffNetAttention(label_dim=10, b=0, head_num=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        variables,
        x,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out.shape == (2, 10)
    # running stats must have moved away from init
    leaves = jax.tree.leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_gradients_flow():
    model = EffNetAttention(label_dim=10, b=0, head_num=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128))
    y = jnp.zeros((2, 10)).at[:, 3].set(1.0)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, x, train=False)
        out = jnp.clip(out, 1e-7, 1 - 1e-7)
        return -jnp.mean(y * jnp.log(out) + (1 - y) * jnp.log(1 - out))

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0


def test_resnet_attention_shapes():
    model = ResNetAttention(label_dim=7)
    x = jnp.zeros((1, 256, 128))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 7)
    n = _param_count(variables["params"])
    # torchvision resnet50 backbone is ~23.5M params (fc removed)
    assert 23e6 < n < 25e6, n


def test_mbnet_shapes():
    model = MBNet(label_dim=7)
    x = jnp.zeros((1, 256, 128))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 7)
    n = _param_count(variables["params"])
    # mobilenet_v2 features are ~2.2M + classifier
    assert 2.0e6 < n < 3.0e6, n


def test_registry():
    for name in ("efficientnet", "resnet", "mbnet"):
        m = create_model(name, label_dim=5, eff_b=0)
        assert m is not None
    with pytest.raises(ValueError):
        create_model("nope")


def test_stem_s2d_exact_and_checkpoint_compatible():
    """Space-to-depth stem (efficientnet._S2DStemConvBN): same parameter
    tree, bit-level eval parity with the strided stem."""
    import numpy as np
    from psla_tpu.models.efficientnet import EfficientNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 1)).astype(np.float32))
    m0 = EfficientNet(b=0)
    m1 = EfficientNet(b=0, stem_s2d=True)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x, train=False)
    ) == jax.tree.structure(v)
    o0 = m0.apply(v, x, train=False)
    o1 = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)


def test_remat_same_forward_and_grads():
    """remat=True must be numerics-neutral: identical param tree, same
    train-mode forward, and matching gradients (it only changes what the
    backward pass stores vs recomputes)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 128)).astype(np.float32))
    m0 = create_model("efficientnet", label_dim=7, eff_b=0, remat=False)
    m1 = create_model("efficientnet", label_dim=7, eff_b=0, remat=True)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(
        m1.init(jax.random.PRNGKey(0), x, train=False)
    ) == jax.tree.structure(v)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        g0, g1,
    )


def test_bn_running_var_matches_torch():
    """ReferenceBatchNorm accumulates torch's UNBIASED batch variance into
    the running stats (torch.nn.BatchNorm2d convention) while normalizing
    with the biased one — flax's stock BatchNorm accumulates the biased
    variance, which skews every eval-mode forward of a self-trained model
    off the reference's trajectory (caught by the protocol-twin test)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from psla_tpu.models.layers import ReferenceBatchNorm

    x = np.random.RandomState(0).randn(8, 4, 2, 16).astype(np.float32)

    bt = torch.nn.BatchNorm2d(16, eps=1e-3, momentum=0.5)
    bt.train()
    want_out = bt(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return ReferenceBatchNorm(
                use_running_average=not train, momentum=0.5, epsilon=1e-3
            )(x)

    m = M()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    out, mut = m.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    bs = mut["batch_stats"]["ReferenceBatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(bs["var"]), bt.running_var.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(bs["mean"]), bt.running_mean.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out),
        want_out.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5,
    )


def test_bn_differs_from_flax_only_in_running_var_bessel():
    """ReferenceBatchNorm reimplements flax BatchNorm.__call__ against
    private flax helpers; this pins the intended contract so a flax
    upgrade that shifts those internals is caught here: outputs and
    running mean identical to stock nn.BatchNorm, running var = flax's
    biased accumulation with the n/(n-1) factor on the batch term."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from psla_tpu.models.layers import ReferenceBatchNorm

    x = np.random.RandomState(2).randn(6, 3, 2, 5).astype(np.float32)
    n = 6 * 3 * 2  # per-channel reduction element count

    def run(cls):
        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                return cls(
                    use_running_average=not train, momentum=0.7,
                    epsilon=1e-3,
                )(x)

        m = M()
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        out, mut = m.apply(
            v, jnp.asarray(x), train=True, mutable=["batch_stats"]
        )
        (bs,) = mut["batch_stats"].values()
        return np.asarray(out), bs

    out_ref, bs_ref = run(ReferenceBatchNorm)
    out_flax, bs_flax = run(nn.BatchNorm)

    np.testing.assert_allclose(out_ref, out_flax, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(bs_ref["mean"]), np.asarray(bs_flax["mean"]), rtol=1e-6
    )
    # var update: momentum*1 + (1-momentum)*batch_var*[n/(n-1) only here]
    batch_var_flax = (np.asarray(bs_flax["var"]) - 0.7) / 0.3
    want_var = 0.7 + 0.3 * batch_var_flax * n / (n - 1)
    np.testing.assert_allclose(
        np.asarray(bs_ref["var"]), want_var, rtol=1e-5, atol=1e-7
    )


def test_bn_axis_name_bessel_uses_global_count():
    """Under a named axis (pmap) the moments are psum'd across devices, so
    the unbiased running-var correction must use the GLOBAL element count
    (n_local x axis size), not the local one — a 2-device pmap over the
    same global batch must produce the same running stats as one device."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from psla_tpu.models.layers import ReferenceBatchNorm

    x = np.random.RandomState(1).randn(8, 4, 2, 16).astype(np.float32)

    def make(axis_name):
        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                return ReferenceBatchNorm(
                    use_running_average=not train, momentum=0.5,
                    epsilon=1e-3, axis_name=axis_name,
                )(x)

        return M()

    m1 = make(None)
    v = m1.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    _, mut1 = m1.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    want = mut1["batch_stats"]["ReferenceBatchNorm_0"]

    mp = make("batch")
    xs = jnp.asarray(x).reshape(2, 4, 4, 2, 16)
    vrep = jax.tree.map(lambda a: jnp.stack([a, a]), v)
    _, mutp = jax.pmap(
        lambda v, x: mp.apply(v, x, train=True, mutable=["batch_stats"]),
        axis_name="batch",
    )(vrep, xs)
    got = mutp["batch_stats"]["ReferenceBatchNorm_0"]
    for key in ("mean", "var"):
        per_dev = np.asarray(got[key])
        np.testing.assert_allclose(per_dev[0], per_dev[1], rtol=1e-6)
        np.testing.assert_allclose(
            per_dev[0], np.asarray(want[key]), rtol=1e-5, atol=1e-6
        )
