"""Synthetic dataset builder shared by data/train/e2e tests.

Generates a tiny labeled WAV corpus where each class is a distinct sine
frequency, so a model can actually learn the mapping (used by the overfit
test, SURVEY.md §4d).
"""

import json
import os

import numpy as np

from psla_tpu.data.wav import write_wav

SR = 16000


def class_tone(k: int, seconds: float, sr: int = SR, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed * 1000 + k)
    t = np.arange(int(seconds * sr)) / sr
    freq = 200.0 * (k + 1)
    wav = 0.5 * np.sin(2 * np.pi * freq * t + rng.rand() * 6.28)
    wav += 0.01 * rng.randn(t.size)
    return np.clip(wav, -1, 1).astype(np.float32)


def build_corpus(
    root: str,
    num_classes: int = 4,
    clips_per_class: int = 6,
    seconds: float = 1.0,
    multi_label_frac: float = 0.25,
    seed: int = 0,
):
    """Write WAVs + datafile JSON + label CSV. Returns (datafile, label_csv)."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    entries = []
    for k in range(num_classes):
        for j in range(clips_per_class):
            wav = class_tone(k, seconds, seed=seed + j)
            labels = [k]
            if rng.rand() < multi_label_frac:
                other = rng.randint(num_classes)
                wav = 0.5 * (wav + class_tone(other, seconds, seed=seed + 50 + j))
                labels.append(other)
            path = os.path.join(root, f"clip_{k}_{j}.wav")
            write_wav(path, wav, SR)
            entries.append(
                {"wav": path, "labels": ",".join(f"/m/{m:05d}" for m in sorted(set(labels)))}
            )
    datafile = os.path.join(root, "data.json")
    with open(datafile, "w") as f:
        json.dump({"data": entries}, f)
    label_csv = os.path.join(root, "labels.csv")
    with open(label_csv, "w") as f:
        f.write("index,mid,display_name\n")
        for k in range(num_classes):
            f.write(f'{k},/m/{k:05d},"class {k}"\n')
    return datafile, label_csv
