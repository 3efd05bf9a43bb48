"""Flax model zoo: EfficientNet/ResNet/MobileNet backbones + pooling heads."""

from psla_tpu.models.efficientnet import EfficientNet, efficientnet_arch  # noqa: F401
from psla_tpu.models.pooling import (  # noqa: F401
    AttentionPool,
    MultiHeadAttentionPool,
    MeanPool,
)
from psla_tpu.models.effnet_att import EffNetAttention  # noqa: F401
from psla_tpu.models.resnet import ResNetAttention  # noqa: F401
from psla_tpu.models.mobilenet import MBNet  # noqa: F401
from psla_tpu.models.registry import create_model, MODEL_REGISTRY  # noqa: F401
