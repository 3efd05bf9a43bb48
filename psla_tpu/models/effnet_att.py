"""EffNetAttention: the PSLA flagship model (reference: src/models/Models.py:63-113).

fbank [B, T, F] -> EfficientNet features -> mean over the residual frequency
axis -> attention pooling over time -> [B, n_classes] probabilities in (0,1).

Layout note: the reference feeds NCHW [B, 1, F, T] (freq as image height,
time as width; Models.py:106-107). Here the TPU-native NHWC equivalent is
[B, F, T, 1]; after the /32 backbone a 128-mel input leaves a 4-row
frequency axis which is averaged away (the reference's AvgPool2d((4,1)),
Models.py:100,110 — we average the full axis, identical for 128 mels and
well-defined for any mel count).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from psla_tpu.models.efficientnet import EfficientNet
from psla_tpu.models.pooling import AttentionPool, MeanPool, MultiHeadAttentionPool


class EffNetAttention(nn.Module):
    label_dim: int = 527
    b: int = 2
    head_num: int = 4
    dtype: jnp.dtype = jnp.float32
    bn_momentum: float = 0.99
    stem_s2d: bool = False  # exact space-to-depth stem (efficientnet.py)
    remat: bool = False  # rematerialize MBConv blocks in backward (memory knob)
    drop_connect_rate: float = 0.2  # stochastic depth (efficientnet_pytorch's 0.2)
    act_compress: str = "none"  # int8 depthwise-activation experiment (ops/qsave.py)

    @nn.compact
    def __call__(self, x, train: bool = False, return_stats: bool = False):
        """return_stats=True yields streaming pooling partial sums (see
        pooling.py) for exact chunked long-audio inference."""
        # [B, T, F] -> [B, F, T, 1]
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        feats = EfficientNet(
            b=self.b, dtype=self.dtype, bn_momentum=self.bn_momentum,
            stem_s2d=self.stem_s2d, remat=self.remat,
            drop_connect_rate=self.drop_connect_rate,
            act_compress=self.act_compress, name="effnet",
        )(x, train=train)
        feats = jnp.mean(feats, axis=1)  # average residual freq axis -> [B, T', C]
        if self.head_num > 1:
            # NOTE: the reference silently ignores head_num > 1 and always
            # builds 4 heads (Models.py:76-80 never forwards head_num);
            # here head_num is honored. head_num=4 matches the reference.
            pool = MultiHeadAttentionPool(
                self.label_dim, head_num=self.head_num, dtype=self.dtype,
                name="attention",
            )
        elif self.head_num == 1:
            pool = AttentionPool(self.label_dim, dtype=self.dtype, name="attention")
        elif self.head_num == 0:
            pool = MeanPool(self.label_dim, dtype=self.dtype, name="attention")
        else:
            raise ValueError(
                "head_num must be >= 0 (0=mean pooling, 1=single-head, "
                ">1=multi-head attention)"
            )
        return pool(feats, return_stats=return_stats)
