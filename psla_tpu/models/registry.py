"""Model selection by name (reference: src/run.py:105-110)."""

from __future__ import annotations

import jax.numpy as jnp

from psla_tpu.models.effnet_att import EffNetAttention
from psla_tpu.models.mobilenet import MBNet
from psla_tpu.models.resnet import ResNetAttention

MODEL_REGISTRY = ("efficientnet", "resnet", "mbnet")


def create_model(
    name: str,
    label_dim: int = 527,
    eff_b: int = 2,
    head_num: int = 4,
    dtype: jnp.dtype = jnp.float32,
    bn_momentum: float = 0.99,
    stem_s2d: bool = False,
    remat: bool = False,
    act_compress: str = "none",
):
    """Build the flax module for a model name (run.py's --model choices)."""
    if name == "efficientnet":
        return EffNetAttention(
            label_dim=label_dim, b=eff_b, head_num=head_num, dtype=dtype,
            bn_momentum=bn_momentum, stem_s2d=stem_s2d, remat=remat,
            act_compress=act_compress,
        )
    if stem_s2d or remat or act_compress != "none":
        # refuse rather than silently ignore (the reference's ignored-flag
        # quirks are deliberately NOT reproduced, SURVEY.md §7.4)
        raise ValueError(
            f"stem_s2d/remat/act_compress are EfficientNet-only options (got model={name!r})"
        )
    if name == "resnet":
        return ResNetAttention(label_dim=label_dim, dtype=dtype)
    if name == "mbnet":
        return MBNet(label_dim=label_dim, dtype=dtype)
    raise ValueError(f"unknown model {name!r}; choices: {MODEL_REGISTRY}")
