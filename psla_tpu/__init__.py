"""psla_tpu — TPU-native audio tagging framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PSLA
("Pretraining, Sampling, Labeling, and Aggregation", Gong, Chung & Glass,
TASLP 2021; reference: haoheliu/psla).

Design (TPU-first, not a port):
  * The entire signal frontend (kaldi-compatible log-mel filterbank, mixup,
    SpecAugment, normalization) runs *on device*, fused into the training
    step, instead of in CPU dataloader workers
    (reference: src/dataloaders/audioset_dataset.py).
  * EfficientNet-B0..B7 / ResNet50 / MobileNetV2 backbones and the
    attention-pooling heads are Flax modules lowered through XLA
    (reference: src/models/Models.py, src/models/HigherModels.py).
  * Data parallelism is a jax.sharding Mesh + jit with sharded batches and
    XLA collectives over ICI, replacing torch.nn.DataParallel
    (reference: src/traintest.py:44-45).
"""

__version__ = "0.1.0"
