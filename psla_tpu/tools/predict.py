"""One-click inference on audio of ANY length.

The reference README promises this exact tool ("predict audios of arbitrary
length (hours)", README.md:29) but its section is TBD with no code
(README.md:267-268). Here it exists:

    python -m psla_tpu.tools.predict clip.wav \
        --ckpt exp/as-01/models/best --label-csv class_labels_indices.csv

Accepts either a psla_tpu orbax checkpoint directory or a reference
PyTorch ``.pth`` file (converted on the fly via models/convert.py, incl.
DataParallel ``module.`` prefixes, ensemble.py:35-38 semantics). Audio of
any duration is windowed into target_length-frame chunks and aggregated
EXACTLY at the attention-pooling layer (psla_tpu/inference.py).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("wav", nargs="+", help="WAV file(s), any duration")
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir or reference .pth file")
    p.add_argument("--label-csv", required=True)
    p.add_argument("--model", default="efficientnet",
                   choices=["efficientnet", "resnet", "mbnet"])
    p.add_argument("--eff_b", type=int, default=2)
    p.add_argument("--att_head", type=int, default=4)
    p.add_argument("--target_length", type=int, default=1056)
    p.add_argument("--dataset_mean", type=float, default=-4.6476)
    p.add_argument("--dataset_std", type=float, default=4.5699)
    p.add_argument("--skip_norm", action="store_true",
                   help="predict with NO normalization (for models "
                        "trained with --skip_norm)")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--top_k", type=int, default=10)
    p.add_argument("--chunk_batch", type=int, default=8)
    return p


def load_variables(ckpt: str, model_name: str, label_dim: int) -> dict:
    """Checkpoint -> flax variables, from either format."""
    if ckpt.endswith((".pth", ".pt")):
        from psla_tpu.models.convert import load_pth

        return load_pth(ckpt, model_name, label_dim)
    import os

    import orbax.checkpoint as ocp

    # orbax requires absolute paths; accept the relative ones users type
    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
    return {
        "params": tree["params"],
        "batch_stats": tree.get("batch_stats", {}),
    }


def main(argv=None):
    args = build_parser().parse_args(argv)

    from psla_tpu.data.datafiles import make_name_dict
    from psla_tpu.data.wav import read_wav
    from psla_tpu.frontend.fbank import FbankConfig
    from psla_tpu.frontend.pipeline import PreprocessConfig
    from psla_tpu.inference import predict_long
    from psla_tpu.models import create_model

    names = make_name_dict(args.label_csv)
    label_dim = len(names)
    model = create_model(
        args.model, label_dim=label_dim, eff_b=args.eff_b,
        head_num=args.att_head,
    )
    variables = load_variables(args.ckpt, args.model, label_dim)
    config = PreprocessConfig(
        fbank=FbankConfig(sample_frequency=float(args.sample_rate)),
        target_length=args.target_length,
        norm_mean=args.dataset_mean,
        norm_std=args.dataset_std,
        skip_norm=args.skip_norm,
    )

    for path in args.wav:
        wav, sr = read_wav(path)
        if sr != args.sample_rate:
            from psla_tpu.tools.prep_fsd import resample

            wav = resample(wav, sr, args.sample_rate)
        probs = predict_long(
            model, variables, wav, config, chunk_batch=args.chunk_batch
        )
        order = np.argsort(probs)[::-1][: args.top_k]
        dur = wav.size / args.sample_rate
        print(f"{path}  ({dur:.1f}s)")
        for i in order:
            print(f"  {probs[i]:.4f}  {names.get(int(i), str(i))}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
