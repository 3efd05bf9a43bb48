"""Checkpoint-converter tests.

Builds synthetic reference-style state_dicts (DataParallel 'module.' keys,
efficientnet_pytorch / torchvision layouts) with random values, converts,
and checks the result has EXACTLY the tree structure + shapes of
model.init — so a real .pth drops in with no key mismatches. Also verifies
numeric pooling-head parity against a minimal torch reimplementation of the
reference head math (HigherModels.py:144-166).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from psla_tpu.models import EffNetAttention
from psla_tpu.models.convert import convert_checkpoint
from psla_tpu.models.efficientnet import efficientnet_arch


def _effnet_state_dict(b: int, label_dim: int, head_num: int, rng):
    """Synthetic efficientnet_pytorch-style state_dict for EffNetAttention."""
    stem, blocks, head = efficientnet_arch(b)
    sd = {}

    def r(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    def bn(key, c):
        sd[f"{key}.weight"] = np.abs(r(c)) + 1.0
        sd[f"{key}.bias"] = r(c)
        sd[f"{key}.running_mean"] = r(c)
        sd[f"{key}.running_var"] = np.abs(r(c)) + 1.0
        sd[f"{key}.num_batches_tracked"] = np.array(100)

    sd["module.effnet._conv_stem.weight"] = r(stem, 1, 3, 3)
    bn("module.effnet._bn0", stem)
    idx = 0
    for args, repeats in blocks:
        for rep in range(repeats):
            in_f = args.in_filters if rep == 0 else args.out_filters
            expanded = in_f * args.expand_ratio
            t = f"module.effnet._blocks.{idx}"
            if args.expand_ratio != 1:
                sd[f"{t}._expand_conv.weight"] = r(expanded, in_f, 1, 1)
                bn(f"{t}._bn0", expanded)
            k = args.kernel
            sd[f"{t}._depthwise_conv.weight"] = r(expanded, 1, k, k)
            bn(f"{t}._bn1", expanded)
            se = max(1, int(in_f * args.se_ratio))
            sd[f"{t}._se_reduce.weight"] = r(se, expanded, 1, 1)
            sd[f"{t}._se_reduce.bias"] = r(se)
            sd[f"{t}._se_expand.weight"] = r(expanded, se, 1, 1)
            sd[f"{t}._se_expand.bias"] = r(expanded)
            sd[f"{t}._project_conv.weight"] = r(args.out_filters, expanded, 1, 1)
            bn(f"{t}._bn2", args.out_filters)
            idx += 1
    sd["module.effnet._conv_head.weight"] = r(head, blocks[-1][0].out_filters, 1, 1)
    bn("module.effnet._bn1", head)
    # fc keys must be ignored by the converter (ensemble.py:35-38 semantics)
    sd["module.effnet._fc.weight"] = r(10, head)
    sd["module.effnet._fc.bias"] = r(10)

    if head_num > 1:
        for i in range(head_num):
            sd[f"module.attention.att.{i}.weight"] = r(label_dim, head, 1, 1)
            sd[f"module.attention.att.{i}.bias"] = r(label_dim)
            sd[f"module.attention.cla.{i}.weight"] = r(label_dim, head, 1, 1)
            sd[f"module.attention.cla.{i}.bias"] = r(label_dim)
        sd["module.attention.head_weight"] = np.full(head_num, 1.0 / head_num, np.float32)
    elif head_num == 1:
        for part in ("att", "cla"):
            sd[f"module.attention.{part}.weight"] = r(label_dim, head, 1, 1)
            sd[f"module.attention.{part}.bias"] = r(label_dim)
    return sd


def _tree_spec(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_spec(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


@pytest.mark.parametrize("head_num", [4, 1])
def test_converted_tree_matches_init_structure(head_num):
    rng = np.random.RandomState(0)
    model = EffNetAttention(label_dim=11, b=0, head_num=head_num)
    sd = _effnet_state_dict(0, 11, head_num, rng)
    converted = convert_checkpoint(sd, "efficientnet", 11)

    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128)), train=False)
    ref_spec = {
        col: _tree_spec(jax.tree.map(np.asarray, dict(tree)))
        for col, tree in ref.items()
    }
    got_spec = {col: _tree_spec(tree) for col, tree in converted.items()}
    assert got_spec == ref_spec

    out = model.apply(converted, jnp.ones((1, 128, 128)) * 0.1, train=False)
    assert out.shape == (1, 11)
    assert np.all(np.isfinite(np.asarray(out)))


def test_multihead_pool_matches_torch_reference_math():
    """Converted fused head == the reference per-head loop math, in torch."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    C, H, n_out, B, T = 24, 4, 6, 2, 9

    sd = {}
    for i in range(H):
        for part in ("att", "cla"):
            sd[f"module.attention.{part}.{i}.weight"] = rng.randn(
                n_out, C, 1, 1
            ).astype(np.float32)
            sd[f"module.attention.{part}.{i}.bias"] = rng.randn(n_out).astype(
                np.float32
            )
    sd["module.attention.head_weight"] = rng.rand(H).astype(np.float32)

    x = rng.randn(B, T, C).astype(np.float32)

    # torch: independent reimplementation of HigherModels.py:144-166 math
    xt = torch.from_numpy(x)
    outs = []
    for i in range(H):
        wa = torch.from_numpy(sd[f"module.attention.att.{i}.weight"][:, :, 0, 0])
        ba = torch.from_numpy(sd[f"module.attention.att.{i}.bias"])
        wc = torch.from_numpy(sd[f"module.attention.cla.{i}.weight"][:, :, 0, 0])
        bc = torch.from_numpy(sd[f"module.attention.cla.{i}.bias"])
        att = torch.sigmoid(xt @ wa.T + ba)  # [B, T, n_out]
        cla = torch.sigmoid(xt @ wc.T + bc)
        att = torch.clamp(att, 1e-7, 1 - 1e-7)
        norm = att / att.sum(dim=1, keepdim=True)
        outs.append(
            (norm * cla).sum(dim=1) * sd["module.attention.head_weight"][i]
        )
    expected = torch.stack(outs).sum(0).numpy()

    from psla_tpu.models.convert import _attention_head

    params: dict = {}
    _attention_head(params, {k[len("module."):]: v for k, v in sd.items()},
                    "attention", n_out)
    from psla_tpu.models.pooling import MultiHeadAttentionPool

    pool = MultiHeadAttentionPool(n_out, head_num=H)
    got = np.asarray(pool.apply({"params": params["attention"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=0, atol=2e-6)


def test_same_padding_matches_torch_static_same():
    """jax 'SAME' conv == torch conv with TF-style asymmetric pre-padding
    (the Conv2dStaticSamePadding semantics pretrained weights assume)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 17, 23).astype(np.float32)  # odd sizes, stride 2
    w = rng.randn(8, 3, 3, 3).astype(np.float32)

    # torch static SAME: pad so out = ceil(in/s), extra on right/bottom
    ih, iw, k, s = 17, 23, 3, 2
    oh, ow = -(-ih // s), -(-iw // s)
    ph = max((oh - 1) * s + k - ih, 0)
    pw = max((ow - 1) * s + k - iw, 0)
    xt = TF.pad(
        torch.from_numpy(x), [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2]
    )
    expected = TF.conv2d(xt, torch.from_numpy(w), stride=s).numpy()

    got = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        window_strides=(s, s),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-5)


def _imagenet_state_dict(b: int, rng):
    """Raw efficientnet_pytorch ImageNet-style state_dict: 3-channel stem,
    _fc classifier, NO attention keys, NO 'effnet.'/'module.' prefixes."""
    sd = _effnet_state_dict(b, 11, 4, rng)
    out = {}
    for k, v in sd.items():
        if "attention" in k:
            continue
        out[k.replace("module.effnet.", "")] = v
    stem = out["_conv_stem.weight"]
    out["_conv_stem.weight"] = rng.randn(
        stem.shape[0], 3, stem.shape[2], stem.shape[3]
    ).astype(np.float32)
    return out


@pytest.mark.parametrize("stem", ["sum", "random"])
def test_imagenet_backbone_conversion(stem):
    """--impretrain path: ImageNet 3-channel backbone + fresh pooling head
    (Models.py:69-72; PSLA's 'P')."""
    from psla_tpu.models.convert import convert_imagenet_backbone

    rng = np.random.RandomState(1)
    model = EffNetAttention(label_dim=11, b=0, head_num=4)
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128)), train=False
    )
    sd = _imagenet_state_dict(0, rng)
    variables = convert_imagenet_backbone(sd, init_vars, stem=stem)

    ref_spec = {
        col: _tree_spec(jax.tree.map(np.asarray, dict(tree)))
        for col, tree in init_vars.items()
    }
    got_spec = {col: _tree_spec(tree) for col, tree in variables.items()}
    assert got_spec == ref_spec

    got_stem = variables["params"]["effnet"]["stem"]["conv"]["kernel"]
    if stem == "sum":
        # HWIO with I=1: collapse of the synthetic RGB stem by summation
        expect = np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)).sum(
            2, keepdims=True
        )
        np.testing.assert_allclose(got_stem, expect, rtol=1e-6)
    else:
        np.testing.assert_array_equal(
            got_stem,
            np.asarray(init_vars["params"]["effnet"]["stem"]["conv"]["kernel"]),
        )
    # pooling head untouched from init
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["attention"]["head_weight"]),
        np.asarray(init_vars["params"]["attention"]["head_weight"]),
    )
    out = model.apply(variables, jnp.ones((1, 128, 128)) * 0.1, train=False)
    assert out.shape == (1, 11) and np.all(np.isfinite(np.asarray(out)))
