"""Typed experiment configuration + dataset presets.

One dataclass replaces the reference's bash-variable -> argparse -> dict
chain (egs/*/run.sh + src/run.py:25-80). Presets mirror the recipe values
(SURVEY.md §6.3). Deliberate fixes of reference quirks (SURVEY.md §7.4):
``weight_decay`` and ``noise`` are honored (the reference silently ignores
both flags), and ``att_head`` values other than 4 actually take effect.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

from psla_tpu.frontend.fbank import FbankConfig
from psla_tpu.frontend.pipeline import PreprocessConfig


@dataclasses.dataclass
class ExperimentConfig:
    # data
    data_train: str = ""
    data_val: str = ""
    data_eval: Optional[str] = None
    label_csv: str = ""
    exp_dir: str = "exp/psla"
    dataset: str = "audioset"
    n_class: int = 527
    # model
    model: str = "efficientnet"
    eff_b: int = 2
    att_head: int = 4
    bn_momentum: float = 0.99  # flax convention; torch 0.01 == 0.99 here
    impretrain: bool = True  # load a pretrained backbone checkpoint if given
    pretrained_ckpt: Optional[str] = None
    # preprocessing
    target_length: int = 1056
    num_mel_bins: int = 128
    freqm: int = 48
    timem: int = 192
    mixup: float = 0.5
    dataset_mean: float = -4.6476
    dataset_std: float = 4.5699
    noise: bool = False
    skip_norm: bool = False
    sample_rate: int = 16000
    # optimization
    lr: float = 1e-4
    weight_decay: float = 5e-7
    batch_size: int = 100
    n_epochs: int = 30
    warmup: bool = True
    # staircase warmup geometry: the reference hardcodes 1000 steps updated
    # every 50 (traintest.py:92-96); exposed so short runs (and the
    # protocol-parity twin test) can exercise a real warmup trajectory
    warmup_steps: int = 1000
    warmup_update_every: int = 50
    lrscheduler_start: int = 10
    lrscheduler_decay: float = 0.5
    loss: str = "BCE"
    metrics: str = "mAP"
    # sampling
    bal: bool = True
    # weight averaging / ensembling
    wa: bool = True
    wa_start: int = 16
    wa_end: int = 30
    save_model: bool = True
    # engine
    num_workers: int = 8
    n_print_steps: int = 100
    seed: int = 0
    dtype: str = "float32"  # or "bfloat16" for MXU throughput
    # rematerialize MBConv blocks in backward: ~3x lower peak activation
    # memory for ~18% step time (v5e, bs=128) — enables larger batches
    remat: bool = False
    # int8 compression of depthwise-conv activations (ops/qsave.py):
    # 'none' | 'q8save' (exact fwd, int8-saved weight-grad) | 'qdq'
    # (straight-through forward quantization). EXPERIMENTAL — speed
    # verdict in PERF.md; numerics bounds in tests/test_qsave.py.
    act_compress: str = "none"
    # fbank lowering: 'auto' (pallas kernel on TPU, fft elsewhere),
    # 'fft', 'gemm', or 'pallas' — see frontend/pipeline.py.
    fbank_method: str = "auto"
    # MXU precision of the fbank DFT/mel matmuls in the TRAINING pipeline.
    # 'high' (bf16x3 split) halves the fbank kernel cost for +2% step
    # throughput at <=1.8e-3 max log-mel deviation from the f32 path —
    # far below SpecAugment/mixup noise. Parity tooling (goldens,
    # tools/predict.py) keeps FbankConfig's 'highest' default.
    fbank_precision: str = "high"
    # parallelism
    num_devices: Optional[int] = None  # None = all visible
    # multi-seed ensemble-axis training (the TPU-native form of the
    # reference's multi-run ensembles behind the 0.474 headline,
    # README.md:206): E>1 trains E independent seeds in ONE program over
    # a 2-D ('ensemble', 'data') mesh — see train/ensemble_loop.py and
    # the --ensemble-seeds CLI flag. Any E on any device count (the
    # ensemble axis takes gcd(E, n_devices) shards; the rest unroll
    # locally per shard).
    ensemble_seeds: int = 1
    # observability: capture a jax.profiler trace of training steps
    # [profile_start_step, profile_start_step + profile_steps) into
    # {exp_dir}/profile (SURVEY.md §5.1; the reference only has wall-clock
    # AverageMeters, traintest.py:26-31)
    profile_steps: int = 0
    profile_start_step: int = 5
    # write per-epoch scalars (losses, mAP/AUC/d', lr, timing meters) to
    # {exp_dir}/tb for tensorboard, alongside the reference-style
    # result.csv artifacts. Rank 0 only; needs the tensorboard package.
    tensorboard: bool = False
    # persistent XLA compilation cache directory: restarted/resumed runs
    # (and every host of a pod relaunch) skip the multi-10s train-step
    # compile. Empty = disabled. Safe to share across runs — entries are
    # keyed on program+compiler fingerprints.
    compilation_cache: str = ""
    # Host->device waveform wire format. 'int16' ships raw PCM samples and
    # dequantizes on-device (train/step._wav_batch): bit-exact for PCM16
    # sources — the AudioSet/FSD50K format — and halves the per-batch
    # transfer (the flagship batch is 2 x bs x 169200 samples: 173 MB as
    # f32, 86 MB as int16; at 1,092 clips/s/chip that is 1.48 GB/s of
    # host->device ingest per chip as f32). Float/24/32-bit PCM sources
    # quantize to int16 on the wire (-96 dBFS error, far below the
    # training noise floor); pick 'float32' for bit-exact handling of
    # non-PCM16 corpora.
    wire: str = "int16"
    # Device-side input prefetch depth: a background thread stages the
    # next batches' host->device transfer while the current step computes
    # (data/device_prefetch.py). 0 disables (transfer serializes with
    # compute, the reference's DataLoader behavior).
    device_prefetch: int = 2

    def preprocess_config(self) -> PreprocessConfig:
        return PreprocessConfig(
            fbank=FbankConfig(
                sample_frequency=float(self.sample_rate),
                num_mel_bins=self.num_mel_bins,
                precision=self.fbank_precision,
            ),
            target_length=self.target_length,
            freq_mask=self.freqm,
            time_mask=self.timem,
            mixup_rate=self.mixup,
            norm_mean=self.dataset_mean,
            norm_std=self.dataset_std,
            skip_norm=self.skip_norm,
            noise=self.noise,
            fbank_method=self.fbank_method,
        )

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=1)

    @classmethod
    def load(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            return cls(**json.load(f))


# Presets mirroring the reference recipes (SURVEY.md §6.3).

FSD50K = dict(
    dataset="fsd50k", n_class=200, lr=5e-4, batch_size=24, n_epochs=40,
    wa_start=21, wa_end=40, lrscheduler_start=10, lrscheduler_decay=0.5,
    freqm=48, timem=192, mixup=0.5, bal=True, target_length=3000,
)

AUDIOSET_FULL = dict(
    dataset="audioset", n_class=527, lr=1e-4, batch_size=100, n_epochs=30,
    wa_start=16, wa_end=30, lrscheduler_start=10, lrscheduler_decay=0.5,
    freqm=48, timem=192, mixup=0.5, bal=True, target_length=1056,
)

AUDIOSET_BALANCED = dict(
    dataset="audioset", n_class=527, lr=1e-3, batch_size=100, n_epochs=60,
    wa_start=41, wa_end=60, lrscheduler_start=35, lrscheduler_decay=0.5,
    freqm=48, timem=192, mixup=0.5, bal=False, target_length=1056,
)

PRESETS = {
    "fsd50k": FSD50K,
    "audioset_full": AUDIOSET_FULL,
    "audioset_balanced": AUDIOSET_BALANCED,
}


def from_preset(name: str, **overrides) -> ExperimentConfig:
    kwargs = dict(PRESETS[name])
    kwargs.update(overrides)
    return ExperimentConfig(**kwargs)
