"""PyTorch reference checkpoint -> flax variables converter.

Converts state_dicts saved by the reference training pipeline (which wraps
models in nn.DataParallel, producing 'module.'-prefixed keys; reference:
src/traintest.py:44-45, 190) into this framework's
{'params': ..., 'batch_stats': ...} trees. Handles:

  * 'module.' prefix stripping and dropping of 'effnet._fc.*' keys, the
    same normalization the reference's ensemble tooling does
    (src/ensemble/ensemble.py:35-38);
  * OIHW -> HWIO conv kernel transposition (NCHW torch -> NHWC flax);
  * depthwise conv layout ([C,1,k,k] -> [k,k,1,C]);
  * per-head attention conv pairs -> the fused DenseGeneral kernel
    ([C, H, 2, n_out]) used by psla_tpu.models.pooling;
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var.

Works on plain dicts of numpy arrays too, so tests don't require torch.

Validation caveat: the converter has been verified against (a) a faithful
torch twin whose state_dict reproduces efficientnet_pytorch's key layout
(tests/torch_twin.py — forward parity to ~1e-5 after conversion) and
(b) synthetic state_dicts reconstructing that layout (tests/test_convert.py)
— but NEVER against the actual published artifacts
(`efficientnet-b2-8bb594d6.pth`, `as_mdl_*.pth`), which cannot be
downloaded on the build machine (zero egress). A renamed or transposed
quirk specific to the real releases would pass every local test; run
tools/convert_ckpt.py's built-in forward check against a reference
forward the first time a real artifact is available.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def normalize_state_dict(sd: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Strip DataParallel 'module.' prefixes; drop fc/num_batches keys."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if "_fc." in k or k.endswith("num_batches_tracked"):
            continue
        out[k] = _np(v)
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dwconv(w: np.ndarray) -> np.ndarray:
    """torch depthwise [C,1,k,k] -> flax [k,k,1,C]."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn(params: dict, stats: dict, prefix: tuple[str, ...], sd: dict, key: str):
    _set(params, prefix + ("scale",), sd[f"{key}.weight"])
    _set(params, prefix + ("bias",), sd[f"{key}.bias"])
    _set(stats, prefix + ("mean",), sd[f"{key}.running_mean"])
    _set(stats, prefix + ("var",), sd[f"{key}.running_var"])


def _attention_head(params: dict, sd: dict, prefix: str, label_dim: int):
    """Reference pooling-head convs -> fused kernels (pooling.py layouts)."""
    if f"{prefix}.head_weight" in sd:  # MHeadAttention
        hw = sd[f"{prefix}.head_weight"]
        h = hw.shape[0]
        c = sd[f"{prefix}.att.0.weight"].shape[1]
        kernel = np.zeros((c, h, 2, label_dim), np.float32)
        bias = np.zeros((h, 2, label_dim), np.float32)
        for i in range(h):
            for j, part in enumerate(("att", "cla")):
                w = sd[f"{prefix}.{part}.{i}.weight"][:, :, 0, 0]  # [n_out, C]
                kernel[:, i, j, :] = w.T
                bias[i, j, :] = sd[f"{prefix}.{part}.{i}.bias"]
        _set(params, ("attention", "heads", "kernel"), kernel)
        _set(params, ("attention", "heads", "bias"), bias)
        _set(params, ("attention", "head_weight"), hw)
    elif f"{prefix}.att.weight" in sd:  # single-head Attention
        c = sd[f"{prefix}.att.weight"].shape[1]
        kernel = np.zeros((c, 2, label_dim), np.float32)
        bias = np.zeros((2, label_dim), np.float32)
        for j, part in enumerate(("att", "cla")):
            kernel[:, j, :] = sd[f"{prefix}.{part}.weight"][:, :, 0, 0].T
            bias[j, :] = sd[f"{prefix}.{part}.bias"]
        _set(params, ("attention", "att_cla", "kernel"), kernel)
        _set(params, ("attention", "att_cla", "bias"), bias)
    else:  # MeanPooling
        _set(params, ("attention", "cla", "kernel"),
             sd[f"{prefix}.cla.weight"][:, :, 0, 0].T)
        _set(params, ("attention", "cla", "bias"), sd[f"{prefix}.cla.bias"])


def _convert_effnet_backbone(sd: dict, params: dict, stats: dict, eff=("effnet",)):
    """Shared efficientnet_pytorch backbone mapping (stem/blocks/head)."""
    _set(params, eff + ("stem", "conv", "kernel"), _conv(sd["effnet._conv_stem.weight"]))
    _bn(params, stats, eff + ("stem", "bn"), sd, "effnet._bn0")

    block_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"effnet\._blocks\.(\d+)\.", k))
        }
    )
    for i in block_ids:
        t = f"effnet._blocks.{i}"
        blk = eff + (f"block_{i}",)
        if f"{t}._expand_conv.weight" in sd:
            _set(params, blk + ("expand", "conv", "kernel"),
                 _conv(sd[f"{t}._expand_conv.weight"]))
            _bn(params, stats, blk + ("expand", "bn"), sd, f"{t}._bn0")
        _set(params, blk + ("depthwise", "conv", "kernel"),
             _dwconv(sd[f"{t}._depthwise_conv.weight"]))
        _bn(params, stats, blk + ("depthwise", "bn"), sd, f"{t}._bn1")
        _set(params, blk + ("se_reduce", "kernel"), _conv(sd[f"{t}._se_reduce.weight"]))
        _set(params, blk + ("se_reduce", "bias"), sd[f"{t}._se_reduce.bias"])
        _set(params, blk + ("se_expand", "kernel"), _conv(sd[f"{t}._se_expand.weight"]))
        _set(params, blk + ("se_expand", "bias"), sd[f"{t}._se_expand.bias"])
        _set(params, blk + ("project", "conv", "kernel"),
             _conv(sd[f"{t}._project_conv.weight"]))
        _bn(params, stats, blk + ("project", "bn"), sd, f"{t}._bn2")

    _set(params, eff + ("head", "conv", "kernel"), _conv(sd["effnet._conv_head.weight"]))
    _bn(params, stats, eff + ("head", "bn"), sd, "effnet._bn1")


def convert_effnet_attention(
    state_dict: Mapping[str, Any], label_dim: int
) -> dict[str, dict]:
    """EffNetAttention .pth state_dict -> flax variables."""
    sd = normalize_state_dict(state_dict)
    params: dict = {}
    stats: dict = {}
    _convert_effnet_backbone(sd, params, stats)
    _attention_head(params, sd, "attention", label_dim)
    return {"params": params, "batch_stats": stats}


def convert_imagenet_backbone(
    state_dict: Mapping[str, Any],
    init_variables: Mapping[str, Any],
    stem: str = "sum",
) -> dict[str, dict]:
    """ImageNet efficientnet_pytorch weights -> flax variables for
    EffNetAttention — the ``--impretrain True`` path (Models.py:69-72,
    PSLA's "P": ImageNet pretraining is worth several mAP points).

    The ImageNet checkpoint has a 3-channel stem and an ``_fc`` classifier;
    the pooling head comes from ``init_variables`` (a fresh model.init).
    ``stem='sum'`` collapses RGB stem filters by summation — a grayscale
    input then produces the same stem response as the RGB-replicated image;
    ``stem='random'`` keeps the fresh init's stem, reproducing
    efficientnet_pytorch's ``_change_in_channels`` behavior (which discards
    the pretrained stem for in_channels=1) exactly.
    """
    sd = normalize_state_dict(state_dict)
    # raw efficientnet_pytorch checkpoints name keys `_conv_stem.*` etc.;
    # PSLA's wrapped model prefixes them with `effnet.`
    if not any(k.startswith("effnet.") for k in sd):
        sd = {f"effnet.{k}": v for k, v in sd.items()}
    stem_w = np.asarray(sd["effnet._conv_stem.weight"])
    if stem_w.shape[1] == 3:
        if stem == "sum":
            sd["effnet._conv_stem.weight"] = stem_w.sum(axis=1, keepdims=True)
        elif stem == "random":
            pass  # overwritten below by the fresh init value
        else:
            raise ValueError(f"unknown stem strategy {stem!r}")
    params: dict = {}
    stats: dict = {}
    _convert_effnet_backbone(sd, params, stats)
    if stem == "random" and stem_w.shape[1] == 3:
        params["effnet"]["stem"]["conv"]["kernel"] = np.asarray(
            init_variables["params"]["effnet"]["stem"]["conv"]["kernel"]
        )
    return _merge_into_init(init_variables, params, stats)


def _merge_into_init(init_variables, params: dict, stats: dict) -> dict:
    """Overlay converted backbone weights on a fresh model.init tree
    (anything not converted — pooling head, classifier — stays fresh)."""

    def merge(init_tree, over):
        out = dict(init_tree)
        for k, v in over.items():
            if isinstance(v, dict) and isinstance(out.get(k), Mapping):
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    return {
        "params": merge(init_variables["params"], params),
        "batch_stats": merge(init_variables.get("batch_stats", {}), stats),
    }


def _convert_resnet_backbone(sd: dict, params: dict, stats: dict):
    """torchvision resnet50 stem + layer mapping ('model.'-prefixed keys)."""
    net = ("resnet",)
    _set(params, net + ("stem", "conv", "kernel"), _conv(sd["model.conv1.weight"]))
    _bn(params, stats, net + ("stem", "bn"), sd, "model.bn1")
    for stage, blocks in enumerate([3, 4, 6, 3]):
        for j in range(blocks):
            t = f"model.layer{stage + 1}.{j}"
            blk = net + (f"layer{stage + 1}_{j}",)
            for c in (1, 2, 3):
                _set(params, blk + (f"conv{c}", "conv", "kernel"),
                     _conv(sd[f"{t}.conv{c}.weight"]))
                _bn(params, stats, blk + (f"conv{c}", "bn"), sd, f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in sd:
                _set(params, blk + ("downsample", "conv", "kernel"),
                     _conv(sd[f"{t}.downsample.0.weight"]))
                _bn(params, stats, blk + ("downsample", "bn"), sd, f"{t}.downsample.1")


def convert_resnet_attention(
    state_dict: Mapping[str, Any], label_dim: int
) -> dict[str, dict]:
    """ResNetAttention .pth state_dict -> flax variables."""
    sd = normalize_state_dict(state_dict)
    params: dict = {}
    stats: dict = {}
    _convert_resnet_backbone(sd, params, stats)
    _attention_head(params, sd, "attention", label_dim)
    return {"params": params, "batch_stats": stats}


def convert_imagenet_resnet(
    state_dict: Mapping[str, Any], init_variables: Mapping[str, Any]
) -> dict[str, dict]:
    """Raw torchvision resnet50 ImageNet weights -> ResNetAttention
    variables. The reference swaps conv1 for a FRESH 1-channel conv
    (Models.py:18) and keeps everything else pretrained; the attention
    head comes fresh from ``init_variables``."""
    sd = normalize_state_dict(state_dict)
    if not any(k.startswith("model.") for k in sd):
        sd = {f"model.{k}": v for k, v in sd.items()}
    sd = {k: v for k, v in sd.items() if not k.startswith("model.fc.")}
    params: dict = {}
    stats: dict = {}
    _convert_resnet_backbone(sd, params, stats)
    params["resnet"]["stem"]["conv"]["kernel"] = np.asarray(
        init_variables["params"]["resnet"]["stem"]["conv"]["kernel"]
    )
    return _merge_into_init(init_variables, params, stats)


def _convert_mbnet_backbone(sd: dict, params: dict, stats: dict):
    """torchvision mobilenet_v2 features mapping ('model.'-prefixed keys)."""

    def conv_bn(flax_prefix, conv_key, bn_key, depthwise=False):
        w = sd[f"{conv_key}.weight"]
        _set(params, flax_prefix + ("conv", "kernel"),
             _dwconv(w) if depthwise else _conv(w))
        _bn(params, stats, flax_prefix + ("bn",), sd, bn_key)

    conv_bn(("stem",), "model.features.0.0", "model.features.0.1")
    # torchvision inverted residual settings (t, c, n, s)
    from psla_tpu.models.mobilenet import INVERTED_RESIDUAL_SETTINGS

    idx = 0
    feat = 1
    for t_ratio, _, n, _ in INVERTED_RESIDUAL_SETTINGS:
        for _ in range(n):
            base = f"model.features.{feat}.conv"
            blk = (f"block_{idx}",)
            if t_ratio == 1:
                conv_bn(blk + ("depthwise",), f"{base}.0.0", f"{base}.0.1",
                        depthwise=True)
                conv_bn(blk + ("project",), f"{base}.1", f"{base}.2")
            else:
                conv_bn(blk + ("expand",), f"{base}.0.0", f"{base}.0.1")
                conv_bn(blk + ("depthwise",), f"{base}.1.0", f"{base}.1.1",
                        depthwise=True)
                conv_bn(blk + ("project",), f"{base}.2", f"{base}.3")
            idx += 1
            feat += 1
    conv_bn(("head",), "model.features.18.0", "model.features.18.1")


def convert_mbnet(state_dict: Mapping[str, Any], label_dim: int) -> dict[str, dict]:
    """MBNet (torchvision mobilenet_v2) .pth state_dict -> flax variables."""
    sd = normalize_state_dict(state_dict)
    params: dict = {}
    stats: dict = {}
    _convert_mbnet_backbone(sd, params, stats)
    _set(params, ("classifier", "kernel"), sd["model.classifier.weight"].T)
    _set(params, ("classifier", "bias"), sd["model.classifier.bias"])
    return {"params": params, "batch_stats": stats}


def convert_imagenet_mbnet(
    state_dict: Mapping[str, Any], init_variables: Mapping[str, Any]
) -> dict[str, dict]:
    """Raw torchvision mobilenet_v2 ImageNet weights -> MBNet variables.
    The reference swaps features[0][0] for a FRESH 1-channel conv and the
    classifier for a fresh Linear (Models.py:51-52); both come fresh from
    ``init_variables`` here."""
    sd = normalize_state_dict(state_dict)
    if not any(k.startswith("model.") for k in sd):
        sd = {f"model.{k}": v for k, v in sd.items()}
    # torchvision's classifier is Sequential(Dropout, Linear) -> keys
    # 'classifier.1.*'; the reference replaces it, so drop and keep fresh
    sd = {k: v for k, v in sd.items() if ".classifier." not in k}
    params: dict = {}
    stats: dict = {}
    _convert_mbnet_backbone(sd, params, stats)
    params["stem"]["conv"]["kernel"] = np.asarray(
        init_variables["params"]["stem"]["conv"]["kernel"]
    )
    return _merge_into_init(init_variables, params, stats)


CONVERTERS = {
    "efficientnet": convert_effnet_attention,
    "resnet": convert_resnet_attention,
    "mbnet": convert_mbnet,
}


def convert_checkpoint(
    state_dict: Mapping[str, Any], model_name: str, label_dim: int
) -> dict[str, dict]:
    return CONVERTERS[model_name](state_dict, label_dim)


def load_pth(path: str, model_name: str, label_dim: int) -> dict[str, dict]:
    """Load a reference .pth checkpoint file and convert (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return convert_checkpoint(sd, model_name, label_dim)
