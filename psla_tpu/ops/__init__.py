"""Hand-scheduled Pallas TPU kernels for the hot ops."""

from psla_tpu.ops.fused_mbconv import fold_block_params, fused_mbconv_eval  # noqa: F401
