"""Serialized inference artifacts (jax.export / StableHLO).

    python -m psla_tpu.tools.export \
        --ckpt exp/as-01/models/best --out exp/as-01/export

packs checkpoint(s) + preprocessing + forward into ONE portable artifact:

    out/model.stablehlo   jax.export blob — member weights embedded as
                          program constants, symbolic batch dimension,
                          lowered for BOTH cpu and tpu
    out/meta.json         label map + the audio contract (sample_rate,
                          chunk_samples, target_length, normalization)

A serving host loads it with ``load_exported(out)`` on ANY jax install —
no psla_tpu model code, no orbax, no checkpoint tree — and calls
``.predict(wav)`` or ``.probs(wav, wav_mean, lengths)``. Repeated
``--ckpt`` exports an ensemble as the mean of the members' probabilities,
the same stacked single-program pattern tools/serve.py serves.

The reference's deployment story is "download the .pth and keep the model
source importable" (/root/reference/pretrained_models/README.md:5,
src/ensemble/ensemble.py:35-68); this replaces it with one
self-contained file. The fbank inside the artifact is pinned to the
'gemm' DFT lowering: pure dot products, zero custom calls, so the same
blob is legal on every export platform (the Pallas fbank is a Mosaic
program — TPU-only and not portably serializable — while gemm is also
the MXU-friendly lowering, see frontend/fbank.py).
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

ARTIFACT = "model.stablehlo"
META = "meta.json"
FORMAT_VERSION = 1


# --------------------------------------------------------------- building


def build_infer_fn(model, members, config):
    """(wav [B, chunk], wav_mean [B], lengths [B]) -> member-mean probs
    [B, n_class] (f32).

    Mirrors tools/serve.py's ``batch_probs``: the fbank runs once per
    batch, the E member forwards unroll back-to-back in one program, and
    the weights close over the trace — jax.export then embeds them as
    artifact constants, which is what makes the blob self-contained."""
    import jax
    import jax.numpy as jnp

    from psla_tpu.inference import _chunk_logmel

    config = dataclasses.replace(config, fbank_method="gemm")
    members = tuple(jax.tree.map(np.asarray, m) for m in members)

    def fn(wav, wav_mean, lengths):
        logmel = _chunk_logmel.__wrapped__(wav, wav_mean, lengths, config)
        outs = [
            model.apply(v, logmel, train=False).astype(jnp.float32)
            for v in members
        ]
        acc = outs[0]
        for o in outs[1:]:
            acc = acc + o
        return acc / len(outs)

    return fn


def export_model(model, members, config, names,
                 *, batch: int | None = None,
                 platforms=("cpu", "tpu")) -> tuple[bytes, dict]:
    """Serialize the inference program. Returns (blob, meta).

    ``batch=None`` exports a symbolic batch dimension (any B at run time);
    an int pins the batch (some embedded runtimes want fully static
    programs — meta records which, and ExportedModel.predict() pads
    accordingly)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if not isinstance(members, (list, tuple)):
        members = [members]
    # `is not None` (not truthiness): batch=0 must be an error, not a
    # silent fall-through to a symbolic artifact (ADVICE r4)
    if batch is not None and int(batch) < 1:
        raise ValueError(f"batch must be >= 1 (got {batch}); "
                         "omit it for a symbolic batch dimension")
    fn = build_infer_fn(model, members, config)
    chunk = config.fbank.buffer_length(config.target_length)
    b = int(batch) if batch is not None else 2
    args = (
        jnp.zeros((b, chunk), jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.int32),
    )
    specs = (
        args if batch is not None
        else jexport.symbolic_args_specs(args, ("b, _", "b", "b"))
    )
    exported = jexport.export(jax.jit(fn), platforms=tuple(platforms))(*specs)
    blob = exported.serialize()
    meta = {
        "format_version": FORMAT_VERSION,
        "platforms": list(platforms),
        "batch": int(batch) if batch is not None else "symbolic",
        "n_class": len(names),
        "names": {str(int(k)): v for k, v in names.items()},
        "n_members": len(members),
        "sample_rate": float(config.fbank.sample_frequency),
        "chunk_samples": int(chunk),
        "target_length": int(config.target_length),
        "norm_mean": float(config.norm_mean),
        "norm_std": float(config.norm_std),
        "skip_norm": bool(config.skip_norm),
        "jax_version": jax.__version__,
    }
    return blob, meta


def save_exported(outdir: str, blob: bytes, meta: dict) -> None:
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, ARTIFACT), "wb") as f:
        f.write(blob)
    with open(os.path.join(outdir, META), "w") as f:
        json.dump(meta, f, indent=2)


# ---------------------------------------------------------------- loading


class ExportedModel:
    """A deserialized artifact: callable without any psla_tpu model code."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.names = {int(k): v for k, v in meta["names"].items()}
        self.chunk_samples = int(meta["chunk_samples"])
        self.n_class = int(meta["n_class"])
        self.sample_rate = float(meta["sample_rate"])
        b = meta.get("batch", "symbolic")
        self.fixed_batch = None if b == "symbolic" else int(b)

    def probs(self, wav, wav_mean=None, lengths=None) -> np.ndarray:
        """[B, chunk_samples] f32 (or a single 1-D chunk) -> [B, n_class]."""
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        if wav.shape[1] != self.chunk_samples:
            raise ValueError(
                f"expected wav chunks of {self.chunk_samples} samples, "
                f"got {wav.shape[1]} (pad/cut host-side, or use .predict)"
            )
        bsz = wav.shape[0]
        if self.fixed_batch and bsz != self.fixed_batch:
            raise ValueError(
                f"artifact was exported with a fixed batch of "
                f"{self.fixed_batch}, got {bsz} (use .predict, which pads)"
            )
        if lengths is None:
            lengths = np.full((bsz,), self.chunk_samples, np.int32)
        lengths = np.asarray(lengths, np.int32)
        if wav_mean is None:
            n = np.maximum(lengths, 1).astype(np.float32)
            wav_mean = wav.sum(axis=1) / n
        wav_mean = np.asarray(wav_mean, np.float32)
        return np.asarray(self._exported.call(wav, wav_mean, lengths))

    def predict(self, wav) -> np.ndarray:
        """1-D waveform of ANY length -> [n_class] probabilities.

        Short clips pad into one chunk; long audio is windowed into
        chunk_samples rows whose probabilities are averaged, weighted by
        true sample count (the EXACT attention-level aggregation needs
        the model's pooling internals — psla_tpu.inference.predict_long —
        which a frozen artifact deliberately does not expose; probability
        averaging is the tools/ensemble.py-style approximation)."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        chunk = self.chunk_samples
        n_rows = max(1, -(-wav.size // chunk))
        rows = np.zeros((n_rows, chunk), np.float32)
        lengths = np.zeros((n_rows,), np.int32)
        for r in range(n_rows):
            piece = wav[r * chunk:(r + 1) * chunk]
            rows[r, : piece.size] = piece
            lengths[r] = max(piece.size, 1)
        # full-clip DC mean, replicated per row (inference.predict_long
        # uses the same full-clip mean for every chunk)
        mean = np.full(
            (n_rows,), wav.mean() if wav.size else 0.0, np.float32
        )
        if self.fixed_batch:
            fb = self.fixed_batch
            pad = -n_rows % fb
            rows = np.pad(rows, ((0, pad), (0, 0)))
            mean = np.pad(mean, (0, pad))
            lengths = np.pad(lengths, (0, pad), constant_values=1)
            probs = np.concatenate([
                self.probs(rows[i:i + fb], mean[i:i + fb], lengths[i:i + fb])
                for i in range(0, n_rows + pad, fb)
            ])[:n_rows]
        else:
            probs = self.probs(rows, mean, lengths)
        w = lengths[:n_rows].astype(np.float64)
        return (probs * (w / w.sum())[:, None]).sum(axis=0)

    def top_k(self, wav, k: int = 10) -> list[tuple[str, float]]:
        p = self.predict(wav)
        order = np.argsort(p)[::-1][:k]
        return [(self.names.get(int(i), str(i)), float(p[i])) for i in order]


def load_exported(path: str) -> ExportedModel:
    """Load an artifact directory written by save_exported / the CLI."""
    from jax import export as jexport

    with open(os.path.join(path, ARTIFACT), "rb") as f:
        blob = f.read()
    with open(os.path.join(path, META)) as f:
        meta = json.load(f)
    return ExportedModel(jexport.deserialize(bytearray(blob)), meta)


# -------------------------------------------------------------------- CLI


def build_parser():
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True, action="append",
                   help="orbax checkpoint dir or reference .pth; repeat "
                        "for an ensemble (mean of members)")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--label-csv", default=None,
                   help="class vocabulary; defaults to the bundled one "
                        "for --dataset")
    p.add_argument("--dataset", default="audioset",
                   choices=["audioset", "fsd50k"])
    p.add_argument("--model", default="efficientnet",
                   choices=["efficientnet", "resnet", "mbnet"])
    p.add_argument("--eff_b", type=int, default=2)
    p.add_argument("--att_head", type=int, default=4)
    p.add_argument("--target_length", type=int, default=1056)
    p.add_argument("--dataset_mean", type=float, default=-4.6476)
    p.add_argument("--dataset_std", type=float, default=4.5699)
    p.add_argument("--skip_norm", action="store_true",
                   help="bake in NO normalization (for models trained "
                        "with --skip_norm; otherwise the artifact would "
                        "silently apply the default mean/std)")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--batch", type=int, default=None,
                   help="pin a static batch size (default: symbolic — "
                        "any batch at run time; must be >= 1)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="compute dtype baked into the artifact (params "
                        "stay f32 constants; bf16 is the TPU serving "
                        "operating point)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from psla_tpu.data.datafiles import make_name_dict
    from psla_tpu.frontend.fbank import FbankConfig
    from psla_tpu.frontend.pipeline import PreprocessConfig
    from psla_tpu.models import create_model
    from psla_tpu.tools.predict import load_variables

    label_csv = args.label_csv
    if not label_csv:
        from psla_tpu import assets

        label_csv = assets.label_csv_for(args.dataset)
    names = make_name_dict(label_csv)
    model = create_model(
        args.model, label_dim=len(names), eff_b=args.eff_b,
        head_num=args.att_head,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    members = [load_variables(c, args.model, len(names)) for c in args.ckpt]
    config = PreprocessConfig(
        fbank=FbankConfig(sample_frequency=float(args.sample_rate)),
        target_length=args.target_length,
        norm_mean=args.dataset_mean,
        norm_std=args.dataset_std,
        skip_norm=args.skip_norm,
    )
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    blob, meta = export_model(
        model, members, config, names, batch=args.batch, platforms=platforms
    )
    meta["model"] = {"name": args.model, "eff_b": args.eff_b,
                     "att_head": args.att_head, "dtype": args.dtype}
    save_exported(args.out, blob, meta)
    print(
        f"exported {len(members)} member(s), {len(names)} classes, "
        f"platforms={','.join(platforms)}, "
        f"batch={'symbolic' if not args.batch else args.batch} -> "
        f"{os.path.join(args.out, ARTIFACT)} "
        f"({len(blob) / 1e6:.1f} MB)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
